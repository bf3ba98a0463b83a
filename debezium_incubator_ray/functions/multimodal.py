"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``large_binary`` columns with a
metadata struct. The Ray-side plumbing — schema, actor-pool stage shape,
small batch sizes for wide binary rows, output layout — is real and tested,
and so are the BASELINE CODECS: ``decode_image`` really decodes baseline
PNG (pure zlib + unfilter) and uncompressed BMP, ``decode_audio`` really
decodes PCM16 WAV (see the "Real baseline codecs" section below). Only
genuinely library-bound containers (JPEG, WebP, compressed audio, video)
raise ``NotImplementedError`` with the integration point documented.
``DecodeStub`` remains the lightweight metadata-only stage (byte-length,
magic prefix, content hash) for pipelines that don't need pixels.

At scale: binary payloads of MBs per row ⇒ batch_size small (64-256), block
size raised so blocks are not split absurdly small, ``batch_format="pyarrow"``
throughout (binary columns do not round-trip pandas cleanly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from debezium_incubator_ray.hashing import stable_hash

MEDIA_META = pa.struct(
    [
        pa.field("n_bytes", pa.int64()),
        pa.field("magic", pa.string()),
        pa.field("content_hash", pa.int64()),
    ]
)


_HEXCHARS = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def _flat_bytes(binary_arr):
    """(large_binary array, per-row offsets rebased to 0, flat byte view)
    of any (chunked, possibly sliced) binary-like array — the shared
    zero-copy substrate for the vectorized byte kernels below."""
    if isinstance(binary_arr, pa.ChunkedArray):
        binary_arr = binary_arr.combine_chunks()
    arr = pc.cast(binary_arr, pa.large_binary())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    lo = int(offsets[0])
    flat = (
        np.frombuffer(bufs[2], dtype=np.uint8)[lo : int(offsets[-1])]
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    return arr, (offsets - lo).astype(np.int64), flat


def _hex_encode(binary_arr: pa.Array) -> pa.Array:
    """Vectorized lowercase-hex encode of a (large_)binary array — one LUT
    gather over the flat byte buffer, no per-row Python."""
    arr, offsets, flat = _flat_bytes(binary_arr)
    n = len(arr)
    hx = np.empty(len(flat) * 2, dtype=np.uint8)
    hx[0::2] = _HEXCHARS[flat >> 4]
    hx[1::2] = _HEXCHARS[flat & 0xF]
    new_off = (offsets * 2).astype(np.int64)
    out = pa.LargeStringArray.from_buffers(
        n, pa.py_buffer(new_off.tobytes()), pa.py_buffer(hx.tobytes())
    )
    if arr.null_count:
        out = pc.if_else(pc.is_valid(arr), out, pa.nulls(n, pa.large_string()))
    return pc.cast(out, pa.string())


def decode_image(payload: bytes):
    """Image decode: REAL for baseline PNG (pure zlib+numpy, filters
    0-4), uncompressed BMP 24/32bpp and BASELINE SEQUENTIAL JPEG
    (grayscale + 4:4:4 color — pure numpy Huffman + IDCT; see
    decode_jpeg_baseline below). Other containers (WebP, progressive/
    subsampled JPEG, ...) raise with the PIL integration point."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png_baseline(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg_baseline(payload)
    raise NotImplementedError(
        "no baseline codec for this image container; plug "
        "PIL.Image.open(io.BytesIO(payload)) here"
    )


def decode_audio(payload: bytes):
    """Audio decode: REAL for PCM16 WAV (decode_wav_pcm16 below).
    Compressed audio raises with the soundfile integration point."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav_pcm16(payload)
    raise NotImplementedError(
        "no baseline codec for this audio container; plug "
        "soundfile/librosa here"
    )


class DecodeStub:
    """Actor-pool stage over binary payloads: the shape of a real decoder
    (state in __init__, vectorized metadata extraction per batch, small
    batches). Emits a typed metadata struct column."""

    def __init__(self, payload_col: str = "payload"):
        self.col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch[self.col].combine_chunks()
        n_bytes = pc.cast(pc.binary_length(payload), pa.int64())
        magic = pc.cast(
            pc.binary_slice(pc.cast(payload, pa.large_binary()), 0, 4), pa.large_binary()
        )
        # hex of the first 4 bytes — deterministic "format sniff";
        # vectorized: nibble LUT over the flat byte buffer, offsets doubled
        magic_hex = _hex_encode(magic)
        chash = pa.array(
            stable_hash(payload).astype(np.int64), type=pa.int64()
        )
        meta = pa.StructArray.from_arrays(
            [n_bytes.combine_chunks() if isinstance(n_bytes, pa.ChunkedArray) else n_bytes,
             magic_hex, chash],
            fields=list(MEDIA_META),
        )
        return batch.append_column("media_meta", meta)


def media_pipeline(ds, payload_col: str = "payload", concurrency: int = 2):
    """The canonical multimodal stage wiring: actor pool, small batches,
    Arrow format end-to-end."""
    return ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"payload_col": payload_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=128,  # wide binary rows: keep batches small
        concurrency=concurrency,
    )


def decode_video_frames(payload: bytes, k: int):  # pragma: no cover - stub
    """Real frame-extraction integration point (pyav/ffmpeg): payload →
    k decoded frames."""
    raise NotImplementedError(
        "video decoding requires pyav/ffmpeg; plug container parsing here"
    )


class FrameSampler:
    """Actor-pool stage: k evenly-spaced 'frames' per payload, EXPLODED to
    one output row per frame — the layout a video pipeline feeds to a
    per-frame model. The extraction is a deterministic byte-slice STAND-IN
    (no codecs in this environment; decode_video_frames is the real
    integration point) but the plumbing is real: vectorized slicing (k
    binary_slice kernels per batch, no per-row Python), stable
    (id, frame_idx) output keys, small batches for wide rows."""

    def __init__(self, k: int = 4, frame_bytes: int = 16,
                 payload_col: str = "payload", id_col: str = "doc_id"):
        self.k = k
        self.w = frame_bytes
        self.col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        raw = batch[self.col].combine_chunks()
        valid = pc.is_valid(raw)
        # null payloads (missing media) must yield NULL frames, not crash
        # the buffer arithmetic: compute over a null-filled image, mask at
        # the end (same pattern as _hex_encode)
        payload, offs, flat = _flat_bytes(pc.fill_null(raw, b""))
        n = len(payload)
        lens = offs[1:] - offs[:-1]
        any_null = raw.null_count > 0
        outs = []
        for i in range(self.k):
            # frame i starts at i * floor(len/k) — evenly spaced, clamped.
            # pyarrow binary_slice takes scalar offsets only, so slice
            # per-row ranges on the flat buffer: one fancy-index gather,
            # no per-row Python
            f_start = offs[:-1] + (lens // self.k) * i
            f_stop = np.maximum(np.minimum(f_start + self.w, offs[1:]), f_start)
            widths = f_stop - f_start
            new_off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(widths, out=new_off[1:])
            total = int(new_off[-1])
            gather = (
                flat[np.repeat(f_start - new_off[:-1], widths)
                     + np.arange(total, dtype=np.int64)]
                if total
                else np.empty(0, np.uint8)
            )
            frames = pa.Array.from_buffers(
                pa.large_binary(), n,
                [None, pa.py_buffer(new_off.tobytes()),
                 pa.py_buffer(gather.tobytes())],
            )
            if any_null:
                frames = pc.if_else(valid, frames, pa.nulls(n, pa.large_binary()))
            outs.append(pa.table({
                self.id_col: batch[self.id_col],
                "frame_idx": pa.array(np.full(n, i, dtype=np.int64)),
                "frame": pc.cast(frames, pa.binary()),
            }))
        return pa.concat_tables(outs)


class ResizeStub:
    """Actor-pool stage shape for thumbnailing: emits a deterministic
    fixed-size fake 'thumbnail' (content-hash-seeded bytes) per payload —
    the real resize plugs into decode_image + an interpolation kernel.
    Output layout (fixed width, binary type, dims metadata) is real."""

    def __init__(self, side: int = 8, payload_col: str = "payload"):
        self.side = side
        self.col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch[self.col].combine_chunks()
        valid = pc.is_valid(payload)
        h = stable_hash(pc.fill_null(payload, b""))
        n_px = self.side * self.side
        # deterministic pseudo-pixels: splitmix-style expansion of the hash
        idx = np.arange(n_px, dtype=np.uint64)
        with np.errstate(over="ignore"):
            px = (h[:, None] * np.uint64(0x9E3779B97F4A7C15)
                  + idx[None, :] * np.uint64(0xBF58476D1CE4E5B9))
        px = ((px >> np.uint64(33)) & np.uint64(0xFF)).astype(np.uint8)
        off = (np.arange(len(payload) + 1, dtype=np.int64) * n_px)
        thumbs = pa.Array.from_buffers(
            pa.large_binary(), len(payload),
            [None, pa.py_buffer(off.tobytes()), pa.py_buffer(px.tobytes())],
        )
        if payload.null_count:
            # missing media -> NULL thumb, never a fabricated one
            thumbs = pc.if_else(
                valid, thumbs, pa.nulls(len(payload), pa.large_binary())
            )
        batch = batch.append_column("thumb", pc.cast(thumbs, pa.binary()))
        return batch.append_column(
            "thumb_dims",
            pa.array([[self.side, self.side]] * len(payload),
                     pa.list_(pa.int32())),
        )


# ---------------------------------------------------------------------------
# Real container-header parsing (pure numpy — no codec libraries needed)
#
# The codec stubs above stay the integration points for PIXEL/SAMPLE work;
# format METADATA, however, needs no codec: PNG/BMP/WAV headers are plain
# fixed-offset structs. parse_media_headers reads them vectorized over the
# flat Arrow byte buffer — the real "decode" step of a metadata-extraction
# pipeline (dimension filters, duration budgets, format routing) at 100 TB.


_PNG_SIG = np.frombuffer(b"\x89PNG\r\n\x1a\n", dtype=np.uint8)


def _byte_at(flat, starts, lens, k):
    """Per-row byte k as int64 (0 where the row is shorter than k+1)."""
    v = np.zeros(len(starts), dtype=np.int64)
    m = lens > k
    v[m] = flat[starts[m] + k]
    return v


def _u32be(flat, starts, lens, o):
    return (
        (_byte_at(flat, starts, lens, o) << 24)
        | (_byte_at(flat, starts, lens, o + 1) << 16)
        | (_byte_at(flat, starts, lens, o + 2) << 8)
        | _byte_at(flat, starts, lens, o + 3)
    )


def _u32le(flat, starts, lens, o):
    return (
        _byte_at(flat, starts, lens, o)
        | (_byte_at(flat, starts, lens, o + 1) << 8)
        | (_byte_at(flat, starts, lens, o + 2) << 16)
        | (_byte_at(flat, starts, lens, o + 3) << 24)
    )


def _u16le(flat, starts, lens, o):
    return _byte_at(flat, starts, lens, o) | (
        _byte_at(flat, starts, lens, o + 1) << 8
    )


# PNG color type -> sample channels (spec: 0 gray, 2 RGB, 3 palette,
# 4 gray+alpha, 6 RGBA)
_PNG_CHANNELS = np.array([1, 0, 3, 1, 2, 0, 4], dtype=np.int64)


def parse_media_headers(
    payload, id_arr=None, id_col: str = "doc_id"
) -> pa.Table:
    """Vectorized container sniff + header parse of a binary column.

    Emits one row per payload: kind ('png' | 'bmp' | 'wav' | 'webp' |
    'gif' | 'unknown'), width/height/channels/bit_depth (images),
    channels/bit_depth/sample_rate/n_samples (wav); fields that do not
    apply are NULL. WebP covers all three container variants (lossy
    'VP8 ' frame header, lossless 'VP8L' packed bit fields, extended
    'VP8X' canvas); GIF87a/89a reads the logical-screen descriptor
    (palette-indexed: 1 channel at the global-table depth) — metadata
    only; WebP/GIF pixel decode stays library-bound.

    - PNG: IHDR at its mandatory first-chunk position — width/height
      u32 big-endian at 16/20, bit depth at 24, channels from the color
      type (25).
    - BMP: BITMAPINFOHEADER — width/height i32 little-endian at 18/22,
      bits-per-pixel u16 at 28 (channels = bpp/8, bit_depth 8).
    - WAV: canonical RIFF layout — channels u16le@22, sample rate
      u32le@24, bits u16le@34, data chunk size u32le@40; n_samples =
      data_size / block_align.

    One pass over the flat Arrow byte buffer; no per-row Python."""
    if isinstance(payload, pa.ChunkedArray):
        payload = payload.combine_chunks()
    valid = pc.is_valid(payload)
    arr, offsets, flat = _flat_bytes(pc.fill_null(payload, b""))
    n = len(arr)
    starts = offsets[:-1]
    lens = offsets[1:] - starts

    b = [_byte_at(flat, starts, lens, k) for k in range(16)]
    is_png = lens >= 29
    for k in range(8):
        is_png &= b[k] == _PNG_SIG[k]
    is_bmp = (lens >= 30) & (b[0] == 0x42) & (b[1] == 0x4D) & ~is_png
    # RIFF/WAVE with a canonical 'fmt ' chunk first — the fixed-offset
    # parse below is only valid for that layout, so gate on it
    is_wav = (
        (lens >= 44)
        & (b[0] == 0x52) & (b[1] == 0x49) & (b[2] == 0x46) & (b[3] == 0x46)
        & (b[8] == 0x57) & (b[9] == 0x41) & (b[10] == 0x56) & (b[11] == 0x45)
        & (b[12] == 0x66) & (b[13] == 0x6D) & (b[14] == 0x74) & (b[15] == 0x20)
        & ~is_png & ~is_bmp
    )
    # the data-chunk size at offset 40 is only the data size when the
    # 'data' tag sits at 36 (canonical layout); files with LIST/fact
    # chunks between fmt and data keep their fmt fields but get NULL
    # n_samples instead of garbage
    wav_has_data = (
        is_wav
        & (_byte_at(flat, starts, lens, 36) == 0x64)
        & (_byte_at(flat, starts, lens, 37) == 0x61)
        & (_byte_at(flat, starts, lens, 38) == 0x74)
        & (_byte_at(flat, starts, lens, 39) == 0x61)
    )
    # WebP: RIFF container with 'WEBP' form type; first chunk tag picks
    # the variant — 'VP8 ' lossy (dims in the VP8 frame header behind
    # the 0x9D012A start code, 14-bit fields), 'VP8L' lossless (packed
    # 14-bit width-1/height-1 + alpha bit behind the 0x2F signature),
    # 'VP8X' extended (24-bit canvas minus-one dims + alpha flag)
    is_riff_webp = (
        (lens >= 30)
        & (b[0] == 0x52) & (b[1] == 0x49) & (b[2] == 0x46) & (b[3] == 0x46)
        & (b[8] == 0x57) & (b[9] == 0x45) & (b[10] == 0x42) & (b[11] == 0x50)
        & ~is_png & ~is_bmp & ~is_wav
    )
    tag3 = _byte_at(flat, starts, lens, 15)
    is_vp8 = (
        is_riff_webp & (b[12] == 0x56) & (b[13] == 0x50) & (b[14] == 0x38)
    )
    webp_lossy = (
        is_vp8 & (tag3 == 0x20)
        & (_byte_at(flat, starts, lens, 23) == 0x9D)
        & (_byte_at(flat, starts, lens, 24) == 0x01)
        & (_byte_at(flat, starts, lens, 25) == 0x2A)
    )
    webp_lossless = (
        is_vp8 & (tag3 == 0x4C)
        & (_byte_at(flat, starts, lens, 20) == 0x2F)
    )
    webp_ext = is_vp8 & (tag3 == 0x58)
    is_webp = webp_lossy | webp_lossless | webp_ext
    # GIF87a/89a: logical-screen dims u16le at 6/8; global color table
    # flag (packed byte 10, bit 7) sets the palette depth
    is_gif = (
        (lens >= 13)
        & (b[0] == 0x47) & (b[1] == 0x49) & (b[2] == 0x46)
        & (b[3] == 0x38) & ((b[4] == 0x37) | (b[4] == 0x39))
        & (b[5] == 0x61)
        & ~is_png & ~is_bmp & ~is_wav & ~is_webp
    )

    width = np.zeros(n, dtype=np.int64)
    height = np.zeros(n, dtype=np.int64)
    channels = np.zeros(n, dtype=np.int64)
    bit_depth = np.zeros(n, dtype=np.int64)
    sample_rate = np.zeros(n, dtype=np.int64)
    n_samples = np.zeros(n, dtype=np.int64)

    width[is_png] = _u32be(flat, starts, lens, 16)[is_png]
    height[is_png] = _u32be(flat, starts, lens, 20)[is_png]
    bit_depth[is_png] = _byte_at(flat, starts, lens, 24)[is_png]
    ct = np.clip(_byte_at(flat, starts, lens, 25), 0, 6)
    channels[is_png] = _PNG_CHANNELS[ct][is_png]

    w_bmp = _u32le(flat, starts, lens, 18)
    h_bmp = _u32le(flat, starts, lens, 22)
    # i32le: top-down BMPs store negative height
    width[is_bmp] = np.abs(w_bmp.astype(np.int32).astype(np.int64))[is_bmp]
    height[is_bmp] = np.abs(h_bmp.astype(np.int32).astype(np.int64))[is_bmp]
    bpp = _u16le(flat, starts, lens, 28)
    # bpp -> (channels, per-channel bit depth): palette BMPs (1/4/8) are
    # one channel at the palette index width; 16-bit is packed RGB555/565
    # (3 channels x 16-bit field); 24/32 are 8-bit BGR(A). Other bpp
    # values get 0 -> masked to NULL below, never a fabricated channels
    _bmp_ch = {1: 1, 4: 1, 8: 1, 16: 3, 24: 3, 32: 4}
    _bmp_bd = {1: 1, 4: 4, 8: 8, 16: 16, 24: 8, 32: 8}
    ch_lut = np.zeros(65, dtype=np.int64)
    bd_lut = np.zeros(65, dtype=np.int64)
    for _bpp, _c in _bmp_ch.items():
        ch_lut[_bpp] = _c
        bd_lut[_bpp] = _bmp_bd[_bpp]
    bpp_idx = np.clip(bpp, 0, 64)
    channels[is_bmp] = ch_lut[bpp_idx][is_bmp]
    bit_depth[is_bmp] = bd_lut[bpp_idx][is_bmp]
    bmp_known = is_bmp & (channels > 0)

    ch_w = _u16le(flat, starts, lens, 22)
    bits_w = _u16le(flat, starts, lens, 34)
    rate_w = _u32le(flat, starts, lens, 24)
    data_w = _u32le(flat, starts, lens, 40)
    block = np.maximum(ch_w * (bits_w // 8), 1)
    channels[is_wav] = ch_w[is_wav]
    bit_depth[is_wav] = bits_w[is_wav]
    sample_rate[is_wav] = rate_w[is_wav]
    n_samples[wav_has_data] = (data_w // block)[wav_has_data]

    # lossy: 14-bit dims at 26/28 behind the frame start code
    width[webp_lossy] = (_u16le(flat, starts, lens, 26) & 0x3FFF)[
        webp_lossy]
    height[webp_lossy] = (_u16le(flat, starts, lens, 28) & 0x3FFF)[
        webp_lossy]
    channels[webp_lossy] = 3
    # lossless: u32le at 21 packs (width-1, height-1, alpha) bit fields
    lbits = _u32le(flat, starts, lens, 21)
    width[webp_lossless] = ((lbits & 0x3FFF) + 1)[webp_lossless]
    height[webp_lossless] = (((lbits >> 14) & 0x3FFF) + 1)[webp_lossless]
    channels[webp_lossless] = (3 + ((lbits >> 28) & 1))[webp_lossless]
    # extended: flags at 20 (bit 4 = alpha), 24-bit minus-one canvas
    # dims at 24/27
    xflags = _byte_at(flat, starts, lens, 20)
    w24 = (_byte_at(flat, starts, lens, 24)
           | (_byte_at(flat, starts, lens, 25) << 8)
           | (_byte_at(flat, starts, lens, 26) << 16))
    h24 = (_byte_at(flat, starts, lens, 27)
           | (_byte_at(flat, starts, lens, 28) << 8)
           | (_byte_at(flat, starts, lens, 29) << 16))
    width[webp_ext] = (w24 + 1)[webp_ext]
    height[webp_ext] = (h24 + 1)[webp_ext]
    channels[webp_ext] = (3 + ((xflags >> 4) & 1))[webp_ext]
    bit_depth[is_webp] = 8

    # GIF: palette-indexed single channel; depth = (packed & 7) + 1
    width[is_gif] = _u16le(flat, starts, lens, 6)[is_gif]
    height[is_gif] = _u16le(flat, starts, lens, 8)[is_gif]
    channels[is_gif] = 1
    gif_packed = _byte_at(flat, starts, lens, 10)
    bit_depth[is_gif] = ((gif_packed & 0x07) + 1)[is_gif]

    kind_codes = np.where(
        is_png, 0, np.where(is_bmp, 1, np.where(
            is_wav, 2, np.where(is_webp, 3, np.where(is_gif, 4, 5))))
    ).astype(np.int32)
    kind = pc.take(
        pa.array(["png", "bmp", "wav", "webp", "gif", "unknown"]),
        pa.array(kind_codes),
    )
    is_img = is_png | is_bmp | is_webp | is_gif
    ch_known = is_png | bmp_known | is_wav | is_webp | is_gif

    def col(vals, mask):
        m = mask & np.asarray(valid.to_numpy(zero_copy_only=False))
        return pa.array(vals, pa.int64(), mask=~m)

    cols = {}
    if id_arr is not None:
        cols[id_col] = id_arr
    cols.update({
        "kind": pc.if_else(valid, kind, pa.nulls(n, pa.string())),
        "width": col(width, is_img),
        "height": col(height, is_img),
        "channels": col(channels, ch_known),
        "bit_depth": col(bit_depth, ch_known),
        "sample_rate": col(sample_rate, is_wav),
        "n_samples": col(n_samples, wav_has_data),
    })
    return pa.table(cols)


def synth_webp_headers(doc_id: np.ndarray) -> pa.Array:
    """Deterministic header-only WebP payloads covering all three
    container variants (variant = doc_id % 3: 0 lossy 'VP8 ', 1
    lossless 'VP8L', 2 extended 'VP8X'); s = doc_id // 3 varies the
    closed forms a SQL oracle restates: w = s % 300 + 1,
    h = s % 200 + 1, alpha (lossless/extended only) = s % 2. Header
    bytes only — the pixel payload stays opaque, which is exactly the
    shape parse_media_headers is specified for."""
    import struct

    out = []
    for d in np.asarray(doc_id, dtype=np.int64):
        d = int(d)
        variant, s = d % 3, d // 3
        w, h = s % 300 + 1, s % 200 + 1
        alpha = s % 2
        if variant == 0:  # lossy: frame tag + start code + 14-bit dims
            body = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
                    + struct.pack("<HH", w & 0x3FFF, h & 0x3FFF)
                    + b"\x00" * 4)
            chunk = b"VP8 " + struct.pack("<I", len(body)) + body
        elif variant == 1:  # lossless: 0x2F + packed bit fields
            bits = (w - 1) | ((h - 1) << 14) | (alpha << 28)
            body = b"\x2f" + struct.pack("<I", bits) + b"\x00" * 5
            chunk = b"VP8L" + struct.pack("<I", len(body)) + body
        else:  # extended: flags + 24-bit minus-one canvas dims
            body = (bytes([0x10 if alpha else 0x00]) + b"\x00\x00\x00"
                    + struct.pack("<I", w - 1)[:3]
                    + struct.pack("<I", h - 1)[:3])
            chunk = b"VP8X" + struct.pack("<I", len(body)) + body
        riff = b"WEBP" + chunk
        out.append(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    return pa.array(out, pa.large_binary())


class MediaHeaderParser:
    """Actor-pool stage wrapping parse_media_headers (state-free today,
    but the stage shape matches a real decoder: small batches, Arrow
    in/out, id passthrough)."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id"):
        self.col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return parse_media_headers(
            batch[self.col], id_arr=batch[self.id_col], id_col=self.id_col
        )


def synth_media_payloads(doc_id: np.ndarray) -> pa.Array:
    """Deterministic REAL container payloads from an id array — the
    multimodal test-data generator (this sandbox's parquet tables carry
    no binary media, so queries synthesize media columns on the fly; the
    same id formulas are restated in the DuckDB oracle, making the
    header PARSER the thing under test — a wrong offset or endianness
    breaks the round-trip).

    kind = doc_id % 3 (0 png, 1 bmp, 2 wav); sub-parameters derive from
    s = doc_id // 3 so they still vary within a kind:

    - png: width s%317+1, height s%211+1, bit depth 8, color type
      [0,2,4,6][s%4] (channels [1,3,2,4]); zero CRC (parsers here do
      not verify checksums).
    - bmp: width s%509+1, height s%255+1, bpp 24/32 by s%2 (54-byte
      BITMAPINFOHEADER).
    - wav: channels s%2+1, sample rate [8000,16000,44100][s%3], 16-bit
      PCM, n_samples s%1000+1, zeroed sample data (silence)."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    n = len(doc_id)
    kind = doc_id % 3
    s = doc_id // 3

    lens = np.empty(n, dtype=np.int64)
    png_m, bmp_m, wav_m = kind == 0, kind == 1, kind == 2
    wav_ch = (s % 2 + 1).astype(np.int64)
    wav_ns = (s % 1000 + 1).astype(np.int64)
    wav_data = wav_ns * wav_ch * 2
    lens[png_m] = 33
    lens[bmp_m] = 54
    lens[wav_m] = 44 + wav_data[wav_m]

    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = np.zeros(int(offsets[-1]), dtype=np.uint8)
    starts = offsets[:-1]

    def put(mask, k, vals):
        flat[starts[mask] + k] = vals

    def put_u32be(mask, o, v):
        v = np.asarray(v, dtype=np.int64)[mask] if np.ndim(v) else np.full(
            int(mask.sum()), v, dtype=np.int64)
        for i, sh in enumerate((24, 16, 8, 0)):
            flat[starts[mask] + o + i] = (v >> sh) & 0xFF

    def put_u32le(mask, o, v):
        v = np.asarray(v, dtype=np.int64)[mask] if np.ndim(v) else np.full(
            int(mask.sum()), v, dtype=np.int64)
        for i, sh in enumerate((0, 8, 16, 24)):
            flat[starts[mask] + o + i] = (v >> sh) & 0xFF

    def put_u16le(mask, o, v):
        v = np.asarray(v, dtype=np.int64)[mask] if np.ndim(v) else np.full(
            int(mask.sum()), v, dtype=np.int64)
        flat[starts[mask] + o] = v & 0xFF
        flat[starts[mask] + o + 1] = (v >> 8) & 0xFF

    # -- png
    if png_m.any():
        for k, byte in enumerate(_PNG_SIG):
            put(png_m, k, byte)
        put_u32be(png_m, 8, 13)  # IHDR length
        for k, byte in enumerate(b"IHDR"):
            put(png_m, 12 + k, byte)
        put_u32be(png_m, 16, s % 317 + 1)
        put_u32be(png_m, 20, s % 211 + 1)
        put(png_m, 24, 8)  # bit depth
        ctypes = np.array([0, 2, 4, 6], dtype=np.int64)[s % 4]
        put(png_m, 25, ctypes[png_m])

    # -- bmp
    if bmp_m.any():
        put(bmp_m, 0, 0x42)
        put(bmp_m, 1, 0x4D)
        put_u32le(bmp_m, 2, 54)   # file size (header-only payload)
        put_u32le(bmp_m, 10, 54)  # pixel-data offset
        put_u32le(bmp_m, 14, 40)  # BITMAPINFOHEADER size
        put_u32le(bmp_m, 18, s % 509 + 1)
        put_u32le(bmp_m, 22, s % 255 + 1)
        put_u16le(bmp_m, 26, 1)   # planes
        bpp = np.where(s % 2 == 0, 24, 32).astype(np.int64)
        put_u16le(bmp_m, 28, bpp)

    # -- wav
    if wav_m.any():
        for k, byte in enumerate(b"RIFF"):
            put(wav_m, k, byte)
        put_u32le(wav_m, 4, 36 + wav_data)
        for k, byte in enumerate(b"WAVEfmt "):
            put(wav_m, 8 + k, byte)
        put_u32le(wav_m, 16, 16)  # fmt chunk size
        put_u16le(wav_m, 20, 1)   # PCM
        put_u16le(wav_m, 22, wav_ch)
        rate = np.array([8000, 16000, 44100], dtype=np.int64)[s % 3]
        put_u32le(wav_m, 24, rate)
        put_u32le(wav_m, 28, rate * wav_ch * 2)  # byte rate
        put_u16le(wav_m, 32, wav_ch * 2)         # block align
        put_u16le(wav_m, 34, 16)                 # bits per sample
        for k, byte in enumerate(b"data"):
            put(wav_m, 36 + k, byte)
        put_u32le(wav_m, 40, wav_data)

    return pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(flat.tobytes())],
    )


# ---------------------------------------------------------------------------
# Real baseline codecs (pure numpy + stdlib zlib — no external image libs).
# These upgrade decode_image/decode_audio from stubs to working decoders for
# the containers this engine's lake actually carries: baseline PNG (8-bit,
# non-interlaced, filters 0-4), uncompressed BMP (24/32bpp BI_RGB) and
# PCM16 WAV. Anything else (JPEG, vorbis, ...) still raises with the
# documented integration point.
# ---------------------------------------------------------------------------

def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32bpp BI_RGB BMP -> (h, w, 3|4) uint8 RGB[A].
    Bottom-up row order and 4-byte row padding handled; top-down
    (negative height) accepted."""
    b = np.frombuffer(payload, dtype=np.uint8)
    if len(b) < 54 or b[0] != 0x42 or b[1] != 0x4D:
        raise ValueError("not a BMP payload")
    off = int(b[10]) | int(b[11]) << 8 | int(b[12]) << 16 | int(b[13]) << 24
    w = int(np.frombuffer(b[18:22].tobytes(), "<i4")[0])
    h = int(np.frombuffer(b[22:26].tobytes(), "<i4")[0])
    bpp = int(b[28]) | int(b[29]) << 8
    comp = int(np.frombuffer(b[30:34].tobytes(), "<u4")[0])
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32bpp BMP supported (bpp={bpp}, "
            f"compression={comp})"
        )
    top_down = h < 0
    h = abs(h)
    ch = bpp // 8
    stride = (w * ch + 3) & ~3
    px = b[off:off + stride * h]
    if len(px) < stride * h:
        raise ValueError("truncated BMP pixel data")
    rows = px.reshape(h, stride)[:, : w * ch].reshape(h, w, ch)
    if not top_down:
        rows = rows[::-1]
    # BGR(A) on disk -> RGB(A)
    out = rows[..., [2, 1, 0] + ([3] if ch == 4 else [])]
    return np.ascontiguousarray(out)


_PNG_COLOR_TYPE_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def decode_png_baseline(payload: bytes) -> np.ndarray:
    """Baseline PNG -> (h, w, C) uint8: 8-bit, non-interlaced,
    gray/RGB/gray+alpha/RGBA, filters 0-4. none/up/sub rows decode
    vectorized; avg/paeth have a true sequential dependency on the
    reconstructed left byte, so they loop per byte — correct but slow
    on large photographic PNGs (a production deployment would swap in
    PIL for those; this engine's lake carries filter-0 payloads).
    Real zlib inflate over the concatenated IDAT stream — a working
    decoder, not a header parse."""
    import struct
    import zlib

    b = payload
    if len(b) < 33 or b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    bitd = colort = interlace = None
    idat = bytearray()
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos:pos + 4])
        typ = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            w, h = struct.unpack(">II", data[:8])
            bitd, colort, _comp, _filt, interlace = data[8:13]
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + crc
    if w is None:
        raise ValueError("PNG missing IHDR")
    if (bitd != 8 or colort not in _PNG_COLOR_TYPE_CHANNELS
            or interlace != 0):
        raise NotImplementedError(
            f"baseline decoder supports 8-bit non-interlaced "
            f"gray/RGB/GA/RGBA only (bit_depth={bitd}, color={colort}, "
            f"interlace={interlace})"
        )
    ch = _PNG_COLOR_TYPE_CHANNELS[colort]
    if _comp != 0:
        raise ValueError(f"PNG compression method {_comp} is invalid")
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error as ex:  # corrupt stream stays in the ValueError
        raise ValueError(f"PNG IDAT stream is corrupt: {ex}") from ex
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has the wrong length")
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        f = int(filters[r])
        line = raw[r, 1:].astype(np.int64)
        prev = out[r - 1].astype(np.int64) if r else np.zeros(
            stride, np.int64
        )
        if f == 0:
            rec = line
        elif f == 2:  # up
            rec = line + prev
        elif f == 1:  # sub: per-channel prefix sums
            rec = line.reshape(w, ch).cumsum(axis=0).reshape(stride)
        elif f == 3:  # avg: sequential in x (left must be the
            # RECONSTRUCTED byte, so reduce mod 256 at every step)
            rec = np.zeros(stride, np.int64)
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                rec[x] = (line[x] + (left + prev[x]) // 2) & 0xFF
        elif f == 4:  # paeth: sequential in x, same mod-256 rule
            rec = np.zeros(stride, np.int64)
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                up = int(prev[x])
                ul = int(prev[x - ch]) if x >= ch else 0
                rec[x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[r] = (rec & 0xFF).astype(np.uint8)
    return out.reshape(h, w, ch)


def decode_wav_pcm16(payload: bytes) -> np.ndarray:
    """PCM16 WAV -> (n_samples, channels) int16 (canonical fmt-first
    layout; the 'data' chunk located by scan)."""
    b = payload
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    import struct

    pos = 12
    ch = bits = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        (ln,) = struct.unpack("<I", b[pos + 4:pos + 8])
        body = b[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk is truncated")
            fmt, ch = struct.unpack("<HH", body[:4])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 supported (fmt={fmt}, bits={bits})"
                )
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if ch is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    arr = np.frombuffer(data, dtype="<i2")
    return arr.reshape(-1, ch)


# ---------------------------------------------------------------------------
# Baseline sequential JPEG (ITU-T T.81): pure numpy + stdlib decoder and a
# minimal matching encoder for deterministic test payloads. Reference
# parity note: the reference pipelines treat media as opaque bytes and
# delegate decode to consumers; this engine decodes the baseline
# containers itself (PNG/BMP/WAV above, JPEG here) and stubs only the
# library-bound ones (WebP, video).


def _jpeg_zigzag() -> np.ndarray:
    """Natural index (r*8+c) of the i-th zigzag position, i = 0..63."""
    pairs = []
    for d in range(15):
        diag = [(r, d - r) for r in range(8) if 0 <= d - r < 8]
        pairs.extend(diag if d % 2 == 1 else diag[::-1])
    return np.array([r * 8 + c for r, c in pairs], dtype=np.int64)


_ZIGZAG = _jpeg_zigzag()


def _jpeg_idct_mat() -> np.ndarray:
    """The 8x8 DCT-II basis A (A[u, x] = c(u)/2 cos((2x+1)uπ/16));
    spatial = Aᵀ F A."""
    A = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            A[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return A


_IDCT_A = _jpeg_idct_mat()


def _huff_decode_table(bits, vals) -> dict:
    """Canonical JPEG Huffman table (DHT BITS + HUFFVAL) →
    {(length, code): symbol}."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return out


class _JpegBits:
    """MSB-first bit reader over the already-destuffed entropy bytes."""

    def __init__(self, data: bytes):
        self.d = data
        self.i = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.i >= len(self.d):
            raise ValueError("truncated JPEG entropy stream")
        v = (self.d[self.i] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.i += 1
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    """DC/AC magnitude decode (T.81 F.2.2.1 EXTEND)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_baseline(payload: bytes) -> np.ndarray:
    """Pure numpy BASELINE SEQUENTIAL JPEG decoder (ITU-T T.81):
    marker parse → canonical Huffman entropy decode (DC diff + AC
    run/size) → dequantize → zigzag → 8x8 IDCT → level shift + clip.
    Grayscale (1 component) returns (h, w) uint8; 4:4:4 color (3
    components, all sampling 1x1) returns (h, w, 3) RGB uint8 via the
    standard YCbCr transform. Progressive (SOF2), subsampled chroma,
    16-bit quant tables, restart intervals and arithmetic coding raise
    NotImplementedError (the PIL integration point); structural
    corruption raises ValueError."""
    b = payload
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    i = 2
    qt: dict = {}
    huff: dict = {}
    sof = None
    scan_comps = None
    while True:
        if i + 2 > len(b):
            raise ValueError("truncated JPEG (no SOS)")
        if b[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        m = b[i + 1]
        i += 2
        if m == 0xD9:
            raise ValueError("JPEG has no scan data")
        if i + 2 > len(b):
            raise ValueError("truncated JPEG segment header")
        seg_len = int.from_bytes(b[i:i + 2], "big")
        body = b[i + 2:i + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        i += seg_len
        if m == 0xDB:  # DQT
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                if pq != 0:
                    raise NotImplementedError(
                        "16-bit JPEG quantization tables unsupported"
                    )
                tbl = np.zeros(64, np.int64)
                tbl[_ZIGZAG] = np.frombuffer(
                    body[o + 1:o + 65], np.uint8
                ).astype(np.int64)
                qt[tq] = tbl.reshape(8, 8)
                o += 65
        elif m == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 15
                bits = list(body[o + 1:o + 17])
                n = sum(bits)
                vals = list(body[o + 17:o + 17 + n])
                huff[(tc, th)] = _huff_decode_table(bits, vals)
                o += 17 + n
        elif m == 0xC0 or m == 0xC1:  # baseline / extended sequential
            prec = body[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for k in range(nc):
                cid, hv, tq = body[6 + 3 * k:9 + 3 * k]
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled JPEG chroma unsupported (4:4:4 only)"
                    )
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif m == 0xC2:
            raise NotImplementedError(
                "progressive JPEG unsupported (baseline sequential only)"
            )
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                   0xCE, 0xCF):
            raise NotImplementedError(
                "non-baseline JPEG coding process unsupported"
            )
        elif m == 0xDD:  # DRI
            if int.from_bytes(body[:2], "big"):
                raise NotImplementedError(
                    "JPEG restart intervals unsupported"
                )
        elif m == 0xDA:  # SOS
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * k], body[2 + 2 * k] >> 4,
                 body[2 + 2 * k] & 15)
                for k in range(ns)
            ]
            break
        # APPn / COM / other: skipped
    if sof is None:
        raise ValueError("JPEG has no SOF before SOS")
    h, w, comps = sof
    if scan_comps is None or len(scan_comps) != len(comps):
        raise ValueError("JPEG scan does not cover the frame components")

    # destuff entropy-coded bytes up to EOI
    ent = bytearray()
    j = i
    while j < len(b):
        v = b[j]
        if v == 0xFF:
            if j + 1 >= len(b):
                raise ValueError("truncated JPEG entropy stream")
            nxt = b[j + 1]
            if nxt == 0x00:
                ent.append(0xFF)
                j += 2
                continue
            if nxt == 0xD9:
                break
            if 0xD0 <= nxt <= 0xD7:
                raise NotImplementedError(
                    "JPEG restart markers unsupported"
                )
            raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        ent.append(v)
        j += 1
    else:
        raise ValueError("JPEG missing EOI")

    reader = _JpegBits(bytes(ent))
    bw, bh = (w + 7) // 8, (h + 7) // 8
    planes = [np.zeros((bh * 8, bw * 8), np.float64) for _ in comps]
    pred = [0] * len(comps)
    comp_q = [qt[tq] for _, tq in comps]
    tables = []
    for (_cid, td, ta) in scan_comps:
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("JPEG scan references an undefined table")
        tables.append((huff[(0, td)], huff[(1, ta)]))
    for by in range(bh):
        for bx in range(bw):
            for ci in range(len(comps)):
                dc_t, ac_t = tables[ci]
                t = reader.read_symbol(dc_t)
                diff = _jpeg_extend(reader.read_bits(t), t)
                pred[ci] += diff
                zz = np.zeros(64, np.int64)
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = reader.read_symbol(ac_t)
                    r, s = rs >> 4, rs & 15
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += r
                    if k > 63:
                        raise ValueError("JPEG AC run past block end")
                    zz[k] = _jpeg_extend(reader.read_bits(s), s)
                    k += 1
                F = np.zeros(64, np.float64)
                F[_ZIGZAG] = zz
                F = F.reshape(8, 8) * comp_q[ci]
                block = _IDCT_A.T @ F @ _IDCT_A
                planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = block
    out = [np.clip(np.round(p[:h, :w] + 128.0), 0, 255) for p in planes]
    if len(out) == 1:
        return out[0].astype(np.uint8)
    if len(out) != 3:
        raise NotImplementedError(
            f"{len(out)}-component JPEG unsupported"
        )
    y, cb, cr = (o.astype(np.float64) for o in out)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _JpegBitWriter:
    """MSB-first bit writer with 0xFF byte stuffing + 1-fill flush."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for k in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        while self.n:
            self.write(1, 1)
        return bytes(self.out)


def _huff_encode_table(symbols) -> tuple:
    """Fixed-length canonical table over ``symbols`` (sorted): length L
    with 2^L > n keeps the all-ones code unused (T.81's padding rule).
    Returns (bits16, huffval, {symbol: (code, L)})."""
    syms = sorted(set(int(s) for s in symbols))
    L = 1
    while (1 << L) <= len(syms):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(syms)
    enc = {s: (idx, L) for idx, s in enumerate(syms)}
    return bits, syms, enc


def _jpeg_cat(v: int) -> int:
    """DC/AC magnitude category (bit length of |v|)."""
    return int(abs(v)).bit_length()


def encode_jpeg_baseline(
    coeff_planes, w: int, h: int, q0: int = 16
) -> bytes:
    """Minimal baseline-sequential JPEG ENCODER for deterministic test
    payloads: ``coeff_planes`` is a list (1 = grayscale, 3 = 4:4:4
    YCbCr) of int arrays (bh, bw, 8, 8) holding QUANTIZED coefficients
    in natural order; the quantization table is flat ``q0``. Emits one
    fixed-length canonical Huffman DC/AC table pair shared by all
    components. The decoder above round-trips it exactly; with DC-only
    blocks and q0 divisible by 8 the decoded pixels have the closed
    form clip(128 + dc·q0/8) a SQL oracle restates with no decoder."""
    import struct

    planes = [np.asarray(p, dtype=np.int64) for p in coeff_planes]
    bh, bw = planes[0].shape[:2]
    # gather needed symbols across all blocks
    dc_syms = set()
    ac_syms = {0x00}
    runs = []  # per (plane, by, bx): (dc_diff, [(runsize, val)...])
    for p in planes:
        pred = 0
        for by in range(bh):
            for bx in range(bw):
                blk = p[by, bx]
                zz = blk.reshape(64)[_ZIGZAG]
                diff = int(zz[0]) - pred
                pred = int(zz[0])
                dc_syms.add(_jpeg_cat(diff))
                acs = []
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        acs.append((0xF0, None))
                        ac_syms.add(0xF0)
                        run -= 16
                    s = _jpeg_cat(v)
                    acs.append(((run << 4) | s, v))
                    ac_syms.add((run << 4) | s)
                    run = 0
                if run:
                    acs.append((0x00, None))  # EOB
                elif not acs or acs[-1][0] != 0x00:
                    # block ended exactly at k=63 with a nonzero: no EOB
                    if int(zz[63]) == 0:
                        acs.append((0x00, None))
                runs.append((diff, acs))
    dc_bits, dc_vals, dc_enc = _huff_encode_table(dc_syms)
    ac_bits, ac_vals, ac_enc = _huff_encode_table(ac_syms)

    wtr = _JpegBitWriter()
    # interleave MCUs: one block per component per position
    per_plane = [list() for _ in planes]
    ri = 0
    for pi in range(len(planes)):
        for _ in range(bh * bw):
            per_plane[pi].append(runs[ri])
            ri += 1
    for m in range(bh * bw):
        for pi in range(len(planes)):
            diff, acs = per_plane[pi][m]
            t = _jpeg_cat(diff)
            code, ln = dc_enc[t]
            wtr.write(code, ln)
            if t:
                wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            for rs, v in acs:
                code, ln = ac_enc[rs]
                wtr.write(code, ln)
                if v is not None:
                    s = rs & 15
                    wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
    ent = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    nat = np.full(64, q0, np.uint8)
    dqt = seg(0xDB, bytes([0x00]) + nat.tobytes())
    ncomp = len(planes)
    sof_body = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof_body += bytes([cid, 0x11, 0x00])
    sof = seg(0xC0, sof_body)
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
        + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals),
    )
    sos_body = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos_body += bytes([cid, 0x00])
    sos_body += bytes([0, 63, 0])
    sos = seg(0xDA, sos_body)
    return (b"\xff\xd8" + dqt + sof + dht + sos + ent + b"\xff\xd9")


def synth_jpeg_payloads(doc_id: np.ndarray) -> pa.Array:
    """Deterministic fully-decodable GRAYSCALE baseline JPEGs with a
    CLOSED-FORM decode a DuckDB oracle restates with no decoder:
    s = doc_id, blocks bw = s % 3 + 1, bh = s % 2 + 1 (w = 8·bw,
    h = 8·bh), DC-only blocks with q0 = 16 and
    dc(by, bx) = ((5·by + 3·bx + s) % 201) - 100, so every decoded
    pixel is exactly clip(128 + 2·dc(r//8, c//8), 0, 255) — the IDCT of
    a DC-only block is dc·q0/8 = 2·dc, float-exact, and the ±100 DC
    range drives pixels through BOTH clip rails."""
    out = []
    for d in np.asarray(doc_id, dtype=np.int64):
        s = int(d)
        bw, bh = s % 3 + 1, s % 2 + 1
        blocks = np.zeros((bh, bw, 8, 8), np.int64)
        for by in range(bh):
            for bx in range(bw):
                blocks[by, bx, 0, 0] = ((5 * by + 3 * bx + s) % 201) - 100
        out.append(encode_jpeg_baseline([blocks], bw * 8, bh * 8, q0=16))
    return pa.array(out, pa.large_binary())


def decode_payload(payload: bytes):
    """Format-sniffing decode: delegates to decode_audio for RIFF/WAVE
    and decode_image for everything else, so each container family has
    exactly ONE magic-byte sniffer. Unknown containers raise
    NotImplementedError naming the integration point."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_audio(payload)
    return decode_image(payload)


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    """length + type + body + CRC32 — the PNG chunk wire format."""
    import struct
    import zlib

    return (struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body)))


def synth_decodable_payloads(doc_id: np.ndarray) -> pa.Array:
    """Deterministic FULLY-DECODABLE payloads (unlike
    synth_media_payloads' header-only bytes): kind = doc_id % 4
    (0 png RGB8 filter-0 with real zlib IDAT, 1 bmp24 bottom-up with
    row padding, 2 wav PCM16 mono, 3 grayscale baseline-sequential
    JPEG). s = doc_id // 4 varies the shape; every pixel/sample
    follows a CLOSED-FORM formula a DuckDB oracle can restate without
    any decoder:

    - png & bmp: w = s % 13 + 1, h = s % 11 + 1,
      v(r, c, ch) = (7r + 11c + 13ch + s) % 256  (RGB order)
    - wav: n = s % 200 + 1, rate 8000/16000/44100 by s % 3,
      sample(i) = ((17i + s) % 65536) - 32768
    - jpeg: w = 8(s % 3 + 1), h = 8(s % 2 + 1), DC-only blocks with a
      flat q0 = 16 table and dc(by, bx) = ((5by + 3bx + s) % 201) - 100
      → every decoded pixel is exactly clip(128 + 2·dc(r//8, c//8))
      (the IDCT of a DC-only block is dc·q0/8, float-exact)

    The codec loop is per payload by nature (zlib/row assembly,
    Huffman bitstreams); the engine wraps it in an actor-pool
    map_batches with small batches — the realistic shape for any real
    codec."""
    import struct
    import zlib

    out = []
    for d in np.asarray(doc_id, dtype=np.int64):
        d = int(d)
        kind, s = d % 4, d // 4
        if kind == 3:
            bw, bh = s % 3 + 1, s % 2 + 1
            blocks = np.zeros((bh, bw, 8, 8), np.int64)
            for by in range(bh):
                for bx in range(bw):
                    blocks[by, bx, 0, 0] = \
                        ((5 * by + 3 * bx + s) % 201) - 100
            out.append(
                encode_jpeg_baseline([blocks], bw * 8, bh * 8, q0=16)
            )
            continue
        if kind in (0, 1):
            w, h = s % 13 + 1, s % 11 + 1
            r, c, chn = np.meshgrid(
                np.arange(h), np.arange(w), np.arange(3), indexing="ij"
            )
            px = ((7 * r + 11 * c + 13 * chn + s) % 256).astype(np.uint8)
            if kind == 0:
                scan = np.concatenate(
                    [np.concatenate(([0], px[row].ravel()))
                     for row in range(h)]
                ).astype(np.uint8)
                idat = zlib.compress(scan.tobytes())
                ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
                out.append(b"\x89PNG\r\n\x1a\n"
                           + _png_chunk(b"IHDR", ihdr)
                           + _png_chunk(b"IDAT", idat)
                           + _png_chunk(b"IEND", b""))
            else:
                stride = (w * 3 + 3) & ~3
                rows = np.zeros((h, stride), np.uint8)
                rows[:, : w * 3] = px[:, :, [2, 1, 0]].reshape(h, w * 3)
                pixels = rows[::-1].tobytes()  # bottom-up
                hdr = (b"BM" + struct.pack("<IHHI", 54 + len(pixels),
                                           0, 0, 54)
                       + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                                     len(pixels), 2835, 2835, 0, 0))
                out.append(hdr + pixels)
        else:
            n = s % 200 + 1
            rate = (8000, 16000, 44100)[s % 3]
            samples = (((17 * np.arange(n, dtype=np.int64) + s) % 65536)
                       - 32768).astype("<i2")
            data = samples.tobytes()
            hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                   + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                           rate * 2, 2, 16)
                   + b"data" + struct.pack("<I", len(data)))
            out.append(hdr + data)
    return pa.array(out, pa.large_binary())


class PixelStatsDecoder:
    """Actor-pool stage that REALLY decodes every payload through the
    baseline codecs and emits exact integer stats per doc — the
    verification surface for the decode round-trip (a wrong filter,
    stride, padding or endianness shifts the sums)."""

    def __init__(self, payload_col: str = "payload",
                 id_col: str = "doc_id"):
        self.col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.col].combine_chunks()
        kinds, nv, vsum, vmin, vmax = [], [], [], [], []
        for i in range(len(payloads)):
            arr = decode_payload(payloads[i].as_py())
            a = arr.astype(np.int64).ravel()
            kinds.append("audio" if arr.dtype == np.int16 else "image")
            nv.append(int(a.size))
            vsum.append(int(a.sum()))
            vmin.append(int(a.min()))
            vmax.append(int(a.max()))
        return pa.table({
            "doc_id": batch[self.id_col],
            "kind": pa.array(kinds, pa.string()),
            "n_values": pa.array(nv, pa.int64()),
            "value_sum": pa.array(vsum, pa.int64()),
            "value_min": pa.array(vmin, pa.int64()),
            "value_max": pa.array(vmax, pa.int64()),
        })


class ResizeImage:
    """REAL thumbnailing actor stage: decodes each image payload through
    the baseline codecs and box-averages it to side x side GRAYSCALE
    (3-channel integer sum per pixel, cell mean by integer floor
    division — fully deterministic, no float). Upscaling degenerates to
    nearest-neighbor (each output cell covers >= 1 input row/col by
    construction: hi = max(lo + 1, ...)). Non-image or undecodable
    payloads yield NULL thumbs (never fabricated pixels). Same output
    layout as ResizeStub: binary ``thumb`` + ``thumb_dims``."""

    def __init__(self, side: int = 8, payload_col: str = "payload"):
        self.side = side
        self.col = payload_col

    def _thumb(self, payload: bytes) -> bytes | None:
        try:
            arr = decode_image(payload)
        except (ValueError, NotImplementedError):
            return None
        if arr.ndim == 2:  # grayscale (e.g. 1-component JPEG): 3x to
            gray = arr.astype(np.int64) * 3  # match the RGB 0..765 scale
        else:
            gray = arr.astype(np.int64).sum(axis=2)  # 0..765 integer
        h, w = gray.shape
        s = self.side
        out = np.empty((s, s), np.uint8)
        rlo = (np.arange(s) * h) // s
        rhi = np.maximum(rlo + 1, ((np.arange(s) + 1) * h) // s)
        clo = (np.arange(s) * w) // s
        chi = np.maximum(clo + 1, ((np.arange(s) + 1) * w) // s)
        for i in range(s):
            for j in range(s):
                cell = gray[rlo[i]:rhi[i], clo[j]:chi[j]]
                # 3-channel sum mean scaled back to 0..255 by // 3
                out[i, j] = (int(cell.sum()) // cell.size) // 3
        return out.tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch[self.col].combine_chunks()
        thumbs = [
            None if not payload[i].is_valid
            else self._thumb(payload[i].as_py())
            for i in range(len(payload))
        ]
        dims = [
            None if t is None else [self.side, self.side] for t in thumbs
        ]
        batch = batch.append_column(
            "thumb", pa.array(thumbs, pa.binary())
        )
        return batch.append_column(
            "thumb_dims", pa.array(dims, pa.list_(pa.int32()))
        )
