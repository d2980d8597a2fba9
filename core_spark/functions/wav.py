"""WAV (RIFF/WAVE PCM) codec on stdlib struct + numpy — no external libs.

Covers the dominant uncompressed-audio container: RIFF header, `fmt `
chunk (format 1 = integer PCM, 16-bit), `data` chunk, arbitrary extra
chunks skipped by their declared size (LIST/INFO etc.). Float PCM
(format 3), ADPCM, A-law/mu-law and other compressed formats raise
NotImplementedError so they surface as `audio_error` rows in the Spark
stage (operators/multimodal.py error-as-data contract), never a stage
failure. Non-16-bit integer PCM is likewise NotImplementedError — the
synthetic corpus and the fixtures are PCM16, the overwhelmingly common
interchange format.

Header parsing is bounds-checked and never raises (`wav_header`), so
corpus-scale metadata extraction runs BEFORE any decode, mirroring
parse_media_header for images.

Spec lineage is public: the RIFF WAVE format (Microsoft/IBM 1991,
mirrored in RFC 2361's registry). The reference engine has no audio
subsystem; this exists for the training-data pipeline surface
(multimodal columns are first-class there).
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, ch) int16 -> RIFF/WAVE PCM16 bytes (fixture-grade)."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = arr.tobytes()  # interleaved frames, little-endian
    fmt = struct.pack("<HHIIHH", _FMT_PCM, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _bad(err: str, **kw) -> dict:
    out = {"audio_ok": False, "audio_format": "audio/wav", "channels": None,
           "sample_rate": None, "n_samples": None, "n_bytes": None,
           "audio_error": err}
    out.update(kw)
    return out


def wav_header(blob: bytes | None) -> dict:
    """Pure kernel: bounds-checked RIFF walk; never raises (error-as-data).

    Returns {audio_ok, audio_format, channels, sample_rate, n_samples,
    n_bytes, audio_error}. A truncated data chunk keeps the fmt-derived
    fields (channels/sample_rate) with audio_ok=False and
    audio_error='truncated_payload', mirroring the image contract.
    """
    if blob is None:
        return {"audio_ok": False, "audio_format": None, "channels": None,
                "sample_rate": None, "n_samples": None, "n_bytes": None,
                "audio_error": "null_blob"}
    n = len(blob)
    if n < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return {"audio_ok": False, "audio_format": None, "channels": None,
                "sample_rate": None, "n_samples": None, "n_bytes": n,
                "audio_error": "unsupported_codec"}
    pos, fmt_info, data_span = 12, None, None
    while pos + 8 <= n:
        cid = blob[pos:pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            if size < 16 or body + 16 > n:
                return _bad("truncated_header", n_bytes=n)
            tag, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", blob, body)
            fmt_info = (tag, ch, rate, bits)
        elif cid == b"data":
            data_span = (body, size)
            break  # fmt precedes data in every writer; stop at the payload
        pos = body + size + (size & 1)  # chunks are word-aligned
    if fmt_info is None or data_span is None:
        return _bad("truncated_header", n_bytes=n)
    tag, ch, rate, bits = fmt_info
    if ch < 1 or rate < 1:
        return _bad("bad_fmt_chunk", n_bytes=n)
    base = {"audio_format": "audio/wav", "channels": int(ch),
            "sample_rate": int(rate), "n_bytes": n}
    if tag != _FMT_PCM or bits != 16:
        return {"audio_ok": False, "n_samples": None,
                "audio_error": f"unsupported_wav_format_{tag}_{bits}bit", **base}
    body, size = data_span
    if body + size > n:
        return {"audio_ok": False, "n_samples": None,
                "audio_error": "truncated_payload", **base}
    return {"audio_ok": True, "n_samples": int(size // (ch * 2)),
            "audio_error": None, **base}


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode to ((n, ch) int16, sample_rate). Raises ValueError on corrupt
    input and NotImplementedError on non-PCM16 variants (both caught as
    error-as-data by the Spark stages)."""
    meta = wav_header(blob)
    if not meta["audio_ok"]:
        err = meta["audio_error"] or "undecodable"
        if err.startswith("unsupported_wav_format"):
            raise NotImplementedError(err)
        raise ValueError(err)
    ch = meta["channels"]
    # re-walk to the data chunk start (header walk proved it's in bounds)
    pos = 12
    while True:
        cid = blob[pos:pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        if cid == b"data":
            break
        pos += 8 + size + (size & 1)
    arr = np.frombuffer(blob, dtype="<i2", offset=pos + 8,
                        count=meta["n_samples"] * ch)
    return arr.reshape(-1, ch), meta["sample_rate"]
