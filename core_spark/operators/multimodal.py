"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container ships no decode libraries (no PIL/cv2/ffmpeg), so the decode
kernels are STUBBED — ``decode_image`` raises NotImplementedError unless the
deterministic fake codec is selected — but every piece of Spark plumbing is
real and tested: the schema contract, the mapInPandas batch shape, the
partition sizing rule, and the metadata extraction that runs BEFORE any
decode (so corrupt bytes never kill a 10^12-row stage).

The fake codec ("fakeimg/v1") is a deterministic header the synthetic corpus
can emit: b"FAKEIMG1" + width(u32 LE) + height(u32 LE) + channels(u8) +
payload. Header parsing is real byte-level work — the same bounds-checked
slicing discipline as the reference's node-text extraction
(pkg/parser/shared/treesitter.go:89-110).

Feature extraction (resize / frame-sample / embed) follows the same pattern:
operate on numpy arrays inside mapInPandas, emit fixed-schema structs.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

FAKE_MAGIC = b"FAKEIMG1"

MEDIA_META_SCHEMA = (
    "media_ok boolean, media_format string, width int, height int, "
    "channels int, n_bytes bigint, media_error string"
)


def parse_media_header(blob: bytes | None) -> dict:
    """Pure kernel: bounds-checked header parse; never raises (error-as-data)."""
    if blob is None:
        return {"media_ok": False, "media_format": None, "width": None,
                "height": None, "channels": None, "n_bytes": None,
                "media_error": "null_blob"}
    n = len(blob)
    if n >= 8 and blob[:8] == FAKE_MAGIC:
        if n < 17:
            return {"media_ok": False, "media_format": "fakeimg/v1", "width": None,
                    "height": None, "channels": None, "n_bytes": n,
                    "media_error": "truncated_header"}
        w, h = struct.unpack_from("<II", blob, 8)
        c = blob[16]
        expected = 17 + w * h * c
        if n < expected:
            return {"media_ok": False, "media_format": "fakeimg/v1", "width": int(w),
                    "height": int(h), "channels": int(c), "n_bytes": n,
                    "media_error": "truncated_payload"}
        return {"media_ok": True, "media_format": "fakeimg/v1", "width": int(w),
                "height": int(h), "channels": int(c), "n_bytes": n,
                "media_error": None}
    # real formats would be sniffed here (PNG/JPEG magics); without decode
    # libs they are metadata-only pass-through
    fmt = None
    if n >= 8 and blob[:8] == b"\x89PNG\r\n\x1a\n":
        fmt = "image/png"
    elif n >= 3 and blob[:3] == b"\xff\xd8\xff":
        fmt = "image/jpeg"
    return {"media_ok": False, "media_format": fmt, "width": None, "height": None,
            "channels": None, "n_bytes": n, "media_error": "unsupported_codec"}


def decode_image(blob: bytes) -> np.ndarray:
    """Decode to (h, w, c) uint8. Only the deterministic fake codec is
    implemented in this container; PNG/JPEG raise NotImplementedError
    (STUB — swap in PIL/libvips on a real cluster)."""
    meta = parse_media_header(blob)
    if not meta["media_ok"]:
        if meta["media_format"] in ("image/png", "image/jpeg"):
            raise NotImplementedError(
                f"no decoder for {meta['media_format']} in this container"
            )
        raise ValueError(meta["media_error"] or "undecodable")
    w, h, c = meta["width"], meta["height"], meta["channels"]
    return np.frombuffer(blob, dtype=np.uint8, offset=17, count=w * h * c).reshape(h, w, c)


def encode_fake_image(arr: np.ndarray) -> bytes:
    """Deterministic fake encoder for fixtures: (h, w, c) uint8 -> bytes."""
    h, w, c = arr.shape
    return FAKE_MAGIC + struct.pack("<II", w, h) + bytes([c]) + arr.tobytes()


def with_media_metadata(df, blob_col: str = "media"):
    """Append MEDIA_META_SCHEMA columns via mapInPandas (Arrow binary batches).

    Partition sizing rule: media rows are fat — set
    spark.sql.files.maxPartitionBytes (or repartition upstream) so a batch of
    blobs fits executor memory; this stage never concatenates blobs.
    """
    keep = [f for f in df.schema.fields]
    fields = ", ".join(f.name + " " + f.dataType.simpleString() for f in keep)

    def run(batches):
        for pdf in batches:
            metas = [parse_media_header(b) for b in pdf[blob_col]]
            out = pdf.copy()
            mdf = pd.DataFrame(metas)
            for col in ("media_ok", "media_format", "width", "height",
                        "channels", "n_bytes", "media_error"):
                out[col] = mdf[col].to_numpy()
            yield out

    return df.mapInPandas(run, fields + ", " + MEDIA_META_SCHEMA)


def with_thumbnail(df, blob_col: str = "media", size: int = 8):
    """Decode + nearest-neighbor resize to (size, size, c) mean-pooled
    features. Works end-to-end for the fake codec; rows whose codec is
    unavailable emit NULL features with the error recorded (never a stage
    failure)."""
    keep_names = [f.name for f in df.schema.fields if f.name != blob_col]
    fields = ", ".join(
        f.name + " " + f.dataType.simpleString()
        for f in df.schema.fields if f.name != blob_col
    )

    def run(batches):
        for pdf in batches:
            feats, errs = [], []
            for b in pdf[blob_col]:
                try:
                    img = decode_image(b)
                    h, w, _ = img.shape
                    yi = (np.arange(size) * h // size).clip(0, h - 1)
                    xi = (np.arange(size) * w // size).clip(0, w - 1)
                    thumb = img[np.ix_(yi, xi)].mean(axis=2)
                    feats.append([float(v) for v in thumb.ravel()])
                    errs.append(None)
                except (NotImplementedError, ValueError) as e:
                    feats.append(None)
                    errs.append(str(e)[:80])
            out = pdf[keep_names].copy()
            out["thumb"] = feats
            out["decode_error"] = errs
            yield out

    return df.mapInPandas(run, fields + ", thumb array<double>, decode_error string")
