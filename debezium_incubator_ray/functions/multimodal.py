"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``large_binary`` columns with a
metadata struct. The Ray-side plumbing — schema, actor-pool stage shape,
small batch sizes for wide binary rows, output layout — is real and tested;
the actual codec work is STUBBED (no image/audio libraries in this
environment): ``DecodeStub`` computes deterministic fake features
(byte-length, magic prefix, content hash) and ``decode_image``/
``decode_audio`` raise ``NotImplementedError`` with the integration point
documented.

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


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real decoder integration point (PIL/opencv): payload → HxWxC array."""
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "environment; plug PIL.Image.open(io.BytesIO(payload)) here"
    )


def decode_audio(payload: bytes):  # pragma: no cover - stub
    raise NotImplementedError(
        "audio decoding requires soundfile/librosa; plug here"
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
