"""Pure-numpy baseline-sequential JPEG codec laws
(functions/multimodal.py decode_jpeg_baseline / encode_jpeg_baseline):
exact DC-only closed form, general-AC round-trip against an independent
naive IDCT, 4:4:4 color with neutral chroma, and the honest refusal
surface (progressive / restart / truncation / non-JPEG)."""

import numpy as np
import pytest

from debezium_incubator_ray.functions.multimodal import (
    decode_jpeg_baseline,
    decode_payload,
    encode_jpeg_baseline,
    synth_decodable_payloads,
    synth_jpeg_payloads,
)


def _naive_idct(F):
    """Textbook O(n^4) IDCT — deliberately independent of the decoder's
    matrix formulation."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv * F[u, v]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            out[x, y] = s / 4
    return out


def test_dc_only_closed_form_both_families():
    """Both synth families decode to exactly clip(128 + 2*dc) per
    block — including pixels driven through BOTH clip rails."""
    ids = np.arange(0, 210, 7, dtype=np.int64)  # dc spans [-100, 100]
    fams = [
        (synth_jpeg_payloads(ids), ids),                  # s = doc_id
        (synth_decodable_payloads(ids * 4 + 3), ids),     # s = doc_id//4
    ]
    lo_seen = hi_seen = False
    for payloads, svals in fams:
        for d, s in enumerate(svals):
            s = int(s)
            bw, bh = s % 3 + 1, s % 2 + 1
            img = decode_payload(payloads[d].as_py())
            assert img.shape == (bh * 8, bw * 8)
            for by in range(bh):
                for bx in range(bw):
                    dc = ((5 * by + 3 * bx + s) % 201) - 100
                    want = min(255, max(0, 128 + 2 * dc))
                    blk = img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                    assert (blk == want).all(), (d, by, bx)
                    lo_seen |= want == 0
                    hi_seen |= want == 255
    assert lo_seen and hi_seen  # the fixture exercises both rails


def test_general_ac_round_trip_vs_naive_idct():
    """Arbitrary quantized coefficient blocks (full AC content,
    run-lengths, ZRL-sized zero runs) round-trip through the encoder +
    decoder and match an independent naive IDCT bit-for-bit."""
    rng = np.random.default_rng(3)
    bh, bw = 2, 3
    blocks = rng.integers(-30, 31, size=(bh, bw, 8, 8))
    blocks[0, 0, :, :] = 0
    blocks[0, 0, 7, 7] = 5  # long zero run -> ZRL path
    img = decode_jpeg_baseline(
        encode_jpeg_baseline([blocks], bw * 8, bh * 8, q0=16))
    for by in range(bh):
        for bx in range(bw):
            want = np.clip(
                np.round(_naive_idct(blocks[by, bx] * 16.0) + 128),
                0, 255).astype(np.uint8)
            assert (img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                    == want).all(), (by, bx)


def test_color_444_neutral_chroma_equals_gray():
    """3-component 4:4:4 with zero chroma coefficients (Cb = Cr = 128
    after level shift) decodes to R = G = B = the grayscale decode of
    the same luma plane."""
    rng = np.random.default_rng(5)
    y = rng.integers(-20, 21, size=(1, 2, 8, 8))
    z = np.zeros((1, 2, 8, 8), np.int64)
    rgb = decode_jpeg_baseline(encode_jpeg_baseline([y, z, z], 16, 8))
    gray = decode_jpeg_baseline(encode_jpeg_baseline([y], 16, 8))
    assert rgb.shape == (8, 16, 3) and gray.shape == (8, 16)
    for ch in range(3):
        assert (rgb[:, :, ch] == gray).all()


def test_refusal_surface():
    pay = bytes(synth_jpeg_payloads(np.array([5], np.int64))[0].as_py())

    # progressive (SOF2) is an honest NotImplementedError
    prog = pay.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg_baseline(prog)

    # a nonzero restart interval is refused
    import struct
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 8)
    with_dri = pay[:2] + dri + pay[2:]
    with pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg_baseline(with_dri)

    # truncated entropy stream is corruption, not silence
    with pytest.raises(ValueError):
        decode_jpeg_baseline(pay[:len(pay) - 6])

    # not a JPEG at all
    with pytest.raises(ValueError):
        decode_jpeg_baseline(b"\x00\x01garbage")

    # subsampled chroma (sampling factor 0x22 on component 1) refused
    i = pay.index(b"\xff\xc0")
    comp0 = i + 2 + 2 + 6  # marker + len + (prec,h,w,nc) -> first comp id
    sub = pay[:comp0 + 1] + b"\x22" + pay[comp0 + 2:]
    with pytest.raises(NotImplementedError, match="subsampled"):
        decode_jpeg_baseline(sub)


from hypothesis import given, settings, strategies as st


@given(
    st.integers(1, 3), st.integers(1, 2),
    st.integers(0, 2**31 - 1),
    st.sampled_from([8, 16, 24]),
    st.sampled_from([1, 3]),
)
@settings(max_examples=40, deadline=None)
def test_property_roundtrip_any_coefficients(bw, bh, seed, q0, ncomp):
    """PROPERTY: any quantized coefficient planes (any block grid, any
    flat quant step, gray or 4:4:4 color) encode+decode to exactly the
    clipped rounded IDCT of the dequantized blocks — matrix-IDCT
    reference computed independently of the decoder's path order."""
    rng = np.random.default_rng(seed)
    planes = [rng.integers(-40, 41, size=(bh, bw, 8, 8))
              for _ in range(ncomp)]
    img = decode_jpeg_baseline(
        encode_jpeg_baseline(planes, bw * 8, bh * 8, q0=q0))

    A = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            A[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)

    def plane_pixels(blocks):
        out = np.zeros((bh * 8, bw * 8))
        for by in range(bh):
            for bx in range(bw):
                F = blocks[by, bx] * float(q0)
                out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = A.T @ F @ A
        return np.clip(np.round(out + 128.0), 0, 255)

    if ncomp == 1:
        assert img.shape == (bh * 8, bw * 8)
        assert (img == plane_pixels(planes[0]).astype(np.uint8)).all()
    else:
        y, cb, cr = (plane_pixels(p) for p in planes)
        r = np.clip(np.round(y + 1.402 * (cr - 128.0)), 0, 255)
        g = np.clip(np.round(
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)),
            0, 255)
        b = np.clip(np.round(y + 1.772 * (cb - 128.0)), 0, 255)
        want = np.stack([r, g, b], axis=2).astype(np.uint8)
        assert img.shape == (bh * 8, bw * 8, 3)
        assert (img == want).all()
