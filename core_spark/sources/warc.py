"""WARC source — Common Crawl's native archive format (ISO 28500 /
WARC/1.0, public spec; the same record grammar warcio and the Common
Crawl examples document).

A web-scale corpus engine must ingest WARC directly: crawl dumps arrive
as `*.warc.gz` with ONE GZIP MEMBER PER RECORD (the standard layout —
it is what makes per-record random access and streaming splits possible
at all). Two layers:

  pure bytes (testable without Spark):
    encode_warc(records)        fixture-grade writer, response records
    parse_warc_bytes(data)      record splitter + header parser; plain
                                concatenated records OR multi-member gzip
                                (auto-detected by magic); error-as-data —
                                a malformed tail yields an `error` record
                                instead of raising, keeping every
                                well-formed prefix record

  Spark (one Arrow stage):
    read_warc(spark, glob)      binaryFile scan → mapInPandas decode →
                                one row per record (path, url, warc_ts,
                                rec_type, payload BINARY, error)

100-TB shape: binaryFile gives one task per archive file (Common Crawl
shards are ~1 GB — natural task granularity); the decode is a single
Arrow-batched Python stage per the fused-stage rule, payloads stay
opaque BINARY columns for the multimodal/text operators downstream, and
header fields land as ordinary columns so Catalyst prunes/filters them.
Per-record gzip means a future split-by-member reader can parallelize
INSIDE a file; documented, not needed at fixture scale.

Record grammar (spec §4): version line `WARC/1.0`, CRLF-separated
named headers, CRLF CRLF, `Content-Length` octets of block, CRLF CRLF
record delimiter.

No reference counterpart (specvital/core reads source trees, not web
archives).
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


def encode_warc(records: list[dict], per_record_gzip: bool = False) -> bytes:
    """Fixture-grade WARC/1.0 writer.

    Each record dict: url (str), ts (ISO-8601 str or datetime),
    payload (bytes), optional rec_type (default 'response'). With
    ``per_record_gzip`` each record becomes its own gzip member — the
    standard `.warc.gz` layout.
    """
    out = []
    for i, r in enumerate(records):
        ts = r["ts"]
        if isinstance(ts, datetime):
            ts = ts.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
        payload = r["payload"]
        head = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: " + r.get("rec_type", "response").encode() + _CRLF
            + b"WARC-Record-ID: <urn:uuid:" + str(i).encode() + b">" + _CRLF
            + b"WARC-Target-URI: " + r["url"].encode() + _CRLF
            + b"WARC-Date: " + ts.encode() + _CRLF
            + b"Content-Length: " + str(len(payload)).encode() + _CRLF
            + _CRLF
        )
        rec = head + payload + _CRLF + _CRLF
        if per_record_gzip:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            rec = buf.getvalue()
        out.append(rec)
    return b"".join(out)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress ALL concatenated gzip members (zlib stops at the first
    member; warc.gz has one per record)."""
    out, pos = [], 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data[pos:]))
        out.append(d.flush())
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # pragma: no cover - defensive
            break
        pos += consumed
    return b"".join(out)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse concatenated WARC records (plain or multi-member gzip).

    Returns one dict per record: url, ts, rec_type, payload, error.
    Malformed input never raises: the well-formed prefix is kept and ONE
    trailing dict with ``error`` set describes the failure (error-as-
    data, the media-decoder convention)."""
    recs: list[dict] = []

    def err(msg: str) -> list[dict]:
        recs.append(
            {"url": None, "ts": None, "rec_type": None,
             "payload": None, "error": msg[:200]}
        )
        return recs

    if data[:2] == _GZIP_MAGIC:
        try:
            data = _gunzip_members(data)
        except Exception as e:
            return err(f"gzip: {type(e).__name__}: {e}")
    pos = 0
    while pos < len(data):
        if data[pos:pos + 4] == _CRLF + _CRLF:  # stray delimiter slack
            pos += 4
            continue
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            return err("truncated header block")
        head = data[pos:head_end]
        lines = head.split(_CRLF)
        if not lines[0].startswith(b"WARC/"):
            return err(f"bad version line at offset {pos}")
        hdrs = {}
        for ln in lines[1:]:
            # the grammar allows zero whitespace after ':' — partition
            # on the bare colon and strip, or 'Content-Length:123'
            # (spec-legal) kills parsing for the whole archive tail
            k, sep, v = ln.partition(b":")
            if sep:
                hdrs[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
        try:
            n = int(hdrs.get("content-length", ""))
        except ValueError:
            return err("missing/invalid Content-Length")
        body_start = head_end + 4
        body_end = body_start + n
        if body_end + 4 > len(data):
            return err("truncated record block")
        if data[body_end:body_end + 4] != _CRLF + _CRLF:
            return err("missing record delimiter")
        recs.append(
            {
                "url": hdrs.get("warc-target-uri"),
                "ts": hdrs.get("warc-date"),
                "rec_type": hdrs.get("warc-type"),
                "payload": data[body_start:body_end],
                "error": None,
            }
        )
        pos = body_end + 4
    return recs


WARC_SCHEMA = (
    "path string, url string, warc_ts string, rec_type string,"
    " payload binary, error string"
)


def read_warc(spark, path_glob: str):
    """binaryFile scan → ONE Arrow decode stage → one row per record."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = {k: [] for k in (
                "path", "url", "warc_ts", "rec_type", "payload", "error")}
            for path, content in zip(pdf["path"], pdf["content"]):
                for r in parse_warc_bytes(bytes(content)):
                    rows["path"].append(path)
                    rows["url"].append(r["url"])
                    rows["warc_ts"].append(r["ts"])
                    rows["rec_type"].append(r["rec_type"])
                    rows["payload"].append(r["payload"])
                    rows["error"].append(r["error"])
            yield pd.DataFrame(rows)

    df = spark.read.format("binaryFile").load(path_glob)
    return df.select("path", "content").mapInPandas(run, WARC_SCHEMA)
