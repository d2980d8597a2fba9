"""JPEG codec (ITU-T T.81) on stdlib struct + numpy — no libjpeg/PIL.

Decoder: baseline sequential DCT (SOF0; SOF1 decodes identically for 8-bit)
AND progressive DCT (SOF2: spectral selection + successive approximation,
DC/AC first and refinement scans, EOB runs — T.81 Annex G), Huffman entropy
coding with tables read from DHT (so real-world files using the Annex K
typical tables decode too), multiple quant tables, arbitrary integer
sampling factors (4:4:4 / 4:2:2 / 4:2:0 covered by the generic MCU walk),
restart markers (DRI/RSTn), grayscale or YCbCr->RGB output.
Arithmetic coding (SOF9+), lossless, hierarchical and 12-bit precision
raise NotImplementedError — they surface as `decode_error` rows in the
Spark stage, never a stage failure (operators/multimodal.py error-as-data
contract).

Encoder: fixture-grade baseline writer used by tests and the synthetic
media corpus. Flat quantization (default q=10) and fixed-length canonical
Huffman tables (every DC symbol 4 bits, every AC run/size symbol 9 bits) —
deliberately suboptimal compression but trivially correct, and expressed
through the same DHT/DQT segments a real encoder writes, so decoding a
fixture exercises exactly the general paths. Supports 4:4:4 and 4:2:0,
optional restart intervals.

Determinism contract used by the `media_pipeline` driver oracle: a constant
GRAY image (R=G=B=v) whose level-shifted DC survives quantization exactly
(8*(v-128) divisible by the flat q, i.e. v ≡ 128 mod 5 at q=10) round-trips
BIT-EXACTLY: chroma is constant 128 (zero after level shift, zero DC), the
luma block is DC-only, and the orthonormal IDCT of a DC-only block is
constant to ~1e-15 before the final round. tests/test_jpeg.py pins this.

Spec lineage is public: ITU-T T.81 (1992) sections F.2 (decoding), A.3.3
(DCT), E.2.4 (byte stuffing). No code is derived from libjpeg.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

# --------------------------------------------------------------------------
# shared tables
# --------------------------------------------------------------------------

# zigzag index k -> (row, col); built, not transcribed (T.81 fig. A.6:
# even diagonals run bottom-left -> top-right, odd ones top-right -> bottom-left)
_ZIGZAG: list[tuple[int, int]] = []
for _d in range(15):
    _ij = [(_i, _d - _i) for _i in range(_d + 1) if _i < 8 and _d - _i < 8]
    _ZIGZAG += _ij if _d % 2 else _ij[::-1]
_ZZ_ROWS = np.array([ij[0] for ij in _ZIGZAG])
_ZZ_COLS = np.array([ij[1] for ij in _ZIGZAG])

# orthonormal 8-point DCT-II matrix: forward F = C @ f @ C.T, inverse
# f = C.T @ F @ C.  DC of a constant level-shifted block a is 8a, matching
# the T.81 convention.
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _n in range(8):
        _C[_u, _n] = _a * np.cos((2 * _n + 1) * _u * np.pi / 16)

_SOF_BASELINE = {0xC0, 0xC1}  # SOF0 baseline, SOF1 extended sequential (8-bit)
_SOF_PROGRESSIVE = 0xC2       # SOF2 progressive DCT, Huffman
_SOF_OTHER = {0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------------------------------------------------------
# header scan (cheap; no entropy decode) — feeds parse_media_header
# --------------------------------------------------------------------------


def jpeg_header(blob: bytes) -> dict:
    """Marker walk up to SOF: width/height/channels + decodability verdict.

    Never raises; mirrors _parse_png_header's error-as-data shape.
    """
    base = {"media_format": "image/jpeg", "n_bytes": len(blob), "width": None,
            "height": None, "channels": None}
    n = len(blob)
    if n < 4 or blob[:2] != b"\xff\xd8":
        return {"media_ok": False, "media_error": "truncated_header", **base}
    pos = 2
    while pos + 4 <= n:
        if blob[pos] != 0xFF:
            return {"media_ok": False, "media_error": "jpeg_bad_marker", **base}
        marker = blob[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", blob, pos + 2)
        if marker in _SOF_BASELINE or marker == _SOF_PROGRESSIVE or marker in _SOF_OTHER:
            if pos + 2 + seglen > n or seglen < 8:
                return {"media_ok": False, "media_error": "truncated_header", **base}
            depth = blob[pos + 4]
            h, w = struct.unpack_from(">HH", blob, pos + 5)
            nc = blob[pos + 9]
            base.update(width=int(w), height=int(h),
                        channels=3 if nc == 3 else int(nc))
            if marker in _SOF_OTHER:
                return {"media_ok": False,
                        "media_error": "unsupported_jpeg_variant", **base}
            ok = depth == 8 and nc in (1, 3) and w > 0 and h > 0
            return {"media_ok": ok,
                    "media_error": None if ok else "unsupported_jpeg_variant",
                    **base}
        pos += 2 + seglen
    return {"media_ok": False, "media_error": "truncated_header", **base}


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


class _Bits:
    """MSB-first bit reader over an unstuffed entropy segment.

    Accumulator-based (the libjpeg bit-buffer idea): bytes are folded into
    an int and fields extracted by shift/mask, so Huffman decode peeks 16
    bits in O(1) instead of looping read1(). Exhaustion semantics match
    the bit-by-bit reader: consuming more bits than the segment holds
    raises jpeg_entropy_truncated.
    """

    __slots__ = ("buf", "n", "pos", "acc", "nacc")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.n = len(buf)
        self.pos = 0
        self.acc = 0
        self.nacc = 0

    def _fill(self):
        while self.nacc <= 24 and self.pos < self.n:
            self.acc = (self.acc << 8) | self.buf[self.pos]
            self.pos += 1
            self.nacc += 8

    def peek16(self) -> int:
        """Next 16 bits zero-padded past end-of-segment. Safe: a phantom
        match on padding always has length > nacc (prefix-free codes), so
        the subsequent consume() raises exactly where read1() would."""
        if self.nacc < 16:
            self._fill()
        if self.nacc >= 16:
            return (self.acc >> (self.nacc - 16)) & 0xFFFF
        return (self.acc << (16 - self.nacc)) & 0xFFFF

    def consume(self, k: int):
        if k > self.nacc:
            raise ValueError("jpeg_entropy_truncated")
        self.nacc -= k
        self.acc &= (1 << self.nacc) - 1

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        if self.nacc < k:
            self._fill()
            if self.nacc < k:
                raise ValueError("jpeg_entropy_truncated")
        self.nacc -= k
        v = self.acc >> self.nacc
        self.acc &= (1 << self.nacc) - 1
        return v

    def read1(self) -> int:
        return self.read(1)


@functools.lru_cache(maxsize=256)
def _huff_table(counts: bytes, symbols: bytes) -> tuple[bytes, bytes]:
    """Canonical-code lookup tables from a DHT segment (T.81 C.2), as a
    (lengths, symbols) pair indexed by the next 16 bits of the stream:
    every 16-bit word whose prefix is code C of length L maps to
    lengths[w]=L, syms[w]=symbol; words matching no code have length 0.

    Cached on the raw DHT bytes: an MJPEG stream (and most single-encoder
    corpora) repeats identical tables in every frame, and per-frame table
    construction was ~20% of small-frame decode time (profiled). bytes
    objects index to ints faster than numpy scalars here.
    """
    lengths = bytearray(1 << 16)
    syms = bytearray(1 << 16)
    code = 0
    k = 0
    for length in range(1, 17):
        span = 1 << (16 - length)
        for _ in range(counts[length - 1]):
            if code >= 1 << length:  # corrupt DHT: canonical code overflow
                raise ValueError("jpeg_bad_huffman_table")
            lo = code << (16 - length)
            lengths[lo:lo + span] = bytes([length]) * span
            syms[lo:lo + span] = bytes([symbols[k]]) * span
            code += 1
            k += 1
        code <<= 1
    return bytes(lengths), bytes(syms)


def _huff_decode(bits: _Bits, table: tuple[bytes, bytes]) -> int:
    w = bits.peek16()
    length = table[0][w]
    if length == 0:
        raise ValueError("jpeg_bad_huffman_code")
    bits.consume(length)
    return table[1][w]


def _decode_block(bits: _Bits, dc_tab, ac_tab, qtab: np.ndarray,
                  pred: int) -> tuple[np.ndarray, int]:
    """One 8x8 block: Huffman -> dequant -> de-zigzag -> IDCT (+128 shift)."""
    t = _huff_decode(bits, dc_tab)
    pred += _extend(bits.read(t), t)
    zz = np.zeros(64)
    zz[0] = pred * qtab[0]
    k = 1
    while k < 64:
        rs = _huff_decode(bits, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("jpeg_coeff_index_overflow")
        zz[k] = _extend(bits.read(s), s) * qtab[k]
        k += 1
    coef = np.zeros((8, 8))
    coef[_ZZ_ROWS, _ZZ_COLS] = zz
    return _C.T @ coef @ _C + 128.0, pred


def _entropy_intervals(blob: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split the scan at RSTn markers, removing 0xFF00 stuffing (E.2.4).

    Returns (intervals, end) where end is the offset of the marker that
    terminated the scan — progressive decode resumes its marker walk there.
    """
    out: list[bytes] = []
    cur = bytearray()
    n = len(blob)
    while pos < n:
        b = blob[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        m = blob[pos + 1] if pos + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:
            out.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # any true marker ends the scan
            break
    out.append(bytes(cur))
    return out, pos


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode a baseline or progressive JPEG to (h, w, 3) RGB or (h, w, 1)
    gray uint8."""
    hdr = jpeg_header(blob)
    if not hdr["media_ok"]:
        if hdr["media_error"] == "unsupported_jpeg_variant":
            raise NotImplementedError("jpeg variant not decodable here")
        raise ValueError(hdr["media_error"] or "jpeg_undecodable")

    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    comps: list[dict] = []
    progressive = False
    coefs: list[np.ndarray] | None = None  # per-comp zigzag DCT coefficients
    restart = 0
    w = h = 0
    pos = 2
    n = len(blob)
    while pos + 4 <= n:
        if blob[pos] != 0xFF:
            raise ValueError("jpeg_bad_marker")
        marker = blob[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD8 or marker == 0x01:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", blob, pos + 2)
        if pos + 2 + seglen > n:
            raise ValueError("jpeg_truncated_segment")
        seg = blob[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT — one or more tables per segment
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                if sp + 65 > len(seg):
                    raise ValueError("jpeg_truncated_segment")
                qtabs[tq] = np.frombuffer(seg, np.uint8, 64, sp + 1).astype(float)
                sp += 65
        elif marker == 0xC4:  # DHT — one or more tables per segment
            sp = 0
            while sp + 17 <= len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0x0F
                counts = seg[sp + 1:sp + 17]
                nsym = sum(counts)
                if sp + 17 + nsym > len(seg):
                    raise ValueError("jpeg_truncated_segment")
                htabs[(tc, th)] = _huff_table(counts, seg[sp + 17:sp + 17 + nsym])
                sp += 17 + nsym
        elif marker in _SOF_BASELINE or marker == _SOF_PROGRESSIVE:
            progressive = marker == _SOF_PROGRESSIVE
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            if any(c["h"] < 1 or c["v"] < 1 for c in comps):
                raise ValueError("jpeg_bad_sampling")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0] if seg else 0
            if len(seg) < 1 + 2 * ns + (3 if progressive else 0):
                raise ValueError("jpeg_truncated_segment")
            scan = []
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                matches = [c for c in comps if c["id"] == cid]
                if not matches:
                    raise ValueError("jpeg_unknown_scan_component")
                scan.append((matches[0], tabs >> 4, tabs & 0x0F))
            if not progressive:
                return _decode_scan(blob, pos + 2 + seglen, w, h, scan,
                                    qtabs, htabs, restart)
            if coefs is None:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcus_x = -(-w // (8 * hmax))
                mcus_y = -(-h // (8 * vmax))
                coefs = [np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64),
                                  np.int64) for c in comps]
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = _progressive_scan(blob, pos + 2 + seglen, w, h, comps,
                                    scan, ss, se, ahal >> 4, ahal & 0x0F,
                                    restart, htabs, coefs)
            continue
        pos += 2 + seglen
    if progressive and coefs is not None:
        return _finish_progressive(w, h, comps, coefs, qtabs)
    raise ValueError("jpeg_missing_sos")


def _decode_scan(blob, pos, w, h, scan, qtabs, htabs, restart) -> np.ndarray:
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
              for c, _, _ in scan]
    for c, _, _ in scan:
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError("non-integer chroma upsampling ratio")

    intervals, _ = _entropy_intervals(blob, pos)
    n_mcus = mcus_x * mcus_y
    per = restart if restart else n_mcus
    bits = None
    iv = 0
    preds = [0] * len(scan)
    for m in range(n_mcus):
        if m % per == 0:
            if iv >= len(intervals):
                raise ValueError("jpeg_entropy_truncated")
            bits = _Bits(intervals[iv])
            iv += 1
            preds = [0] * len(scan)
        my, mx = divmod(m, mcus_x)
        for ci, (c, dc_id, ac_id) in enumerate(scan):
            try:
                dc_tab = htabs[(0, dc_id)]
                ac_tab = htabs[(1, ac_id)]
                qtab = qtabs[c["tq"]]
            except KeyError:
                raise ValueError("jpeg_missing_table") from None
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    block, preds[ci] = _decode_block(
                        bits, dc_tab, ac_tab, qtab, preds[ci])
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = block

    return _assemble([c for c, _, _ in scan], planes, w, h, hmax, vmax)


def _assemble(comps, planes, w, h, hmax, vmax) -> np.ndarray:
    """Upsample chroma, crop the MCU padding, convert YCbCr->RGB."""
    full = []
    for c, plane in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# progressive decode (T.81 Annex G): each SOS deposits partial DCT
# coefficients into per-component zigzag arrays; IDCT happens once at EOI
# --------------------------------------------------------------------------


def _progressive_scan(blob, pos, w, h, comps, scan, ss, se, ah, al,
                      restart, htabs, coefs) -> int:
    """Decode one progressive scan into `coefs`; return the marker offset
    where the entropy-coded data ended (the outer walk resumes there)."""
    if ss > se or se > 63 or al > 13:
        raise ValueError("jpeg_bad_spectral_selection")
    if ss == 0 and se != 0:
        raise ValueError("jpeg_bad_spectral_selection")  # DC scans: Se == 0
    if ss > 0 and len(scan) != 1:
        raise ValueError("jpeg_bad_spectral_selection")  # AC scans: one comp
    intervals, end = _entropy_intervals(blob, pos)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    interleaved = len(scan) > 1
    c0 = scan[0][0]
    if interleaved:
        n_units = mcus_x * mcus_y
    else:
        # non-interleaved: the unit is one block of the component's own grid
        comp_w = -(-w * c0["h"] // hmax)
        comp_h = -(-h * c0["v"] // vmax)
        blocks_x = -(-comp_w // 8)
        blocks_y = -(-comp_h // 8)
        n_units = blocks_x * blocks_y

    tabs = []
    for c, dc_id, ac_id in scan:
        need = None
        if ss == 0 and ah == 0:
            need = (0, dc_id)  # DC-first needs a DC table
        elif ss > 0:
            need = (1, ac_id)  # AC scans need an AC table (refine incl.)
        if need is not None and need not in htabs:
            raise ValueError("jpeg_missing_table")
        tabs.append(htabs.get(need) if need else None)

    # frame index of each scan component (identity, not ==: two comps can
    # share identical sampling/table params)
    idx = [[i for i, fc in enumerate(comps) if fc is c][0] for c, _, _ in scan]

    per = restart if restart else n_units
    bits = None
    iv = 0
    preds = [0] * len(scan)
    eobrun = 0
    for m in range(n_units):
        if m % per == 0:
            if iv >= len(intervals):
                raise ValueError("jpeg_entropy_truncated")
            bits = _Bits(intervals[iv])
            iv += 1
            preds = [0] * len(scan)
            eobrun = 0
        if ss == 0:
            if interleaved:
                my, mx = divmod(m, mcus_x)
                for ci, (c, _, _) in enumerate(scan):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            cof = coefs[idx[ci]][my * c["v"] + by,
                                                 mx * c["h"] + bx]
                            if ah == 0:
                                t = _huff_decode(bits, tabs[ci])
                                preds[ci] += _extend(bits.read(t), t)
                                cof[0] = preds[ci] << al
                            else:
                                cof[0] |= bits.read1() << al
            else:
                by, bx = divmod(m, blocks_x)
                cof = coefs[idx[0]][by, bx]
                if ah == 0:
                    t = _huff_decode(bits, tabs[0])
                    preds[0] += _extend(bits.read(t), t)
                    cof[0] = preds[0] << al
                else:
                    cof[0] |= bits.read1() << al
        else:
            by, bx = divmod(m, blocks_x)
            cof = coefs[idx[0]][by, bx]
            if ah == 0:
                eobrun = _first_ac_block(bits, cof, ss, se, al, eobrun,
                                         tabs[0])
            else:
                eobrun = _refine_ac_block(bits, cof, ss, se, al, eobrun,
                                          tabs[0])
    return end


def _first_ac_block(bits, cof, ss, se, al, eobrun, ac_tab) -> int:
    """AC first scan for one block (G.1.2.2): run/size coding with EOBn."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(bits, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            return (1 << r) - 1 + (bits.read(r) if r else 0)
        k += r
        if k > se:
            raise ValueError("jpeg_coeff_index_overflow")
        cof[k] = _extend(bits.read(s), s) << al
        k += 1
    return 0


def _refine_ac_block(bits, cof, ss, se, al, eobrun, ac_tab) -> int:
    """AC successive-approximation refinement for one block (G.1.2.3).

    History-nonzero coefficients consume one correction bit wherever the
    decode path passes them (including inside ZRL skips and EOB runs);
    newly-nonzero coefficients arrive as run/1 symbols with a sign bit.
    """
    p1, m1 = 1 << al, -1 << al

    def _correct_tail(k):
        # positions covered by an EOB run: correction bits only
        while k <= se:
            c = int(cof[k])
            if c != 0 and bits.read1() and (c & p1) == 0:
                cof[k] = c + p1 if c > 0 else c + m1
            k += 1

    if eobrun > 0:
        _correct_tail(ss)
        return eobrun - 1

    k = ss
    while k <= se:
        rs = _huff_decode(bits, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        newval = 0
        if s == 0:
            if r != 15:
                # EOBn: (1<<r)+appended blocks total, incl. this one's tail
                run = (1 << r) - 1 + (bits.read(r) if r else 0)
                _correct_tail(k)
                return run
            # r == 15: ZRL — skip 16 zero-history coefficients
        else:
            if s != 1:
                raise ValueError("jpeg_bad_progressive_refinement")
            newval = p1 if bits.read1() else m1
        while k <= se:
            c = int(cof[k])
            if c != 0:
                if bits.read1() and (c & p1) == 0:
                    cof[k] = c + p1 if c > 0 else c + m1
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if s and k <= se:
            cof[k] = newval
        k += 1
    return 0


def _finish_progressive(w, h, comps, coefs, qtabs) -> np.ndarray:
    """Dequantize + IDCT every accumulated block, then assemble planes."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c, z in zip(comps, coefs):
        if c["tq"] not in qtabs:
            raise ValueError("jpeg_missing_table")
        deq = z.astype(float) * qtabs[c["tq"]]
        by, bx = z.shape[0], z.shape[1]
        fr = np.zeros((by, bx, 8, 8))
        fr[:, :, _ZZ_ROWS, _ZZ_COLS] = deq
        blocks = np.einsum("un,yxuv,vm->yxnm", _C, fr, _C) + 128.0
        planes.append(blocks.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
    return _assemble(comps, planes, w, h, hmax, vmax)


# --------------------------------------------------------------------------
# encoder (fixtures + synthetic media corpus)
# --------------------------------------------------------------------------

_ENC_Q = 10  # flat quantization step; see module docstring for the exactness rule


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # E.2.4 byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        """Byte-align with 1-bits (F.1.2.3)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _mag_bits(v: int) -> tuple[int, int]:
    """Signed coefficient -> (size t, t-bit magnitude code) (F.1.2.1)."""
    if v == 0:
        return 0, 0
    t = int(abs(v)).bit_length()
    return t, v if v >= 0 else v + (1 << t) - 1


# fixed-length canonical tables: DC symbols 0..11 as 4-bit codes (code = symbol),
# AC symbols 0..254 as 9-bit codes.  Neither assigns the all-ones code of its
# length (12th of 16 / 255th of 512), as T.81 C.2 requires.
_DC_COUNTS = bytes([0, 0, 0, 12] + [0] * 12)
_DC_SYMBOLS = bytes(range(12))
_AC_COUNTS = bytes([0] * 8 + [255] + [0] * 7)
_AC_SYMBOLS = bytes(range(255))


def _encode_block(bw: _BitWriter, block: np.ndarray, pred: int) -> int:
    """Forward DCT + flat quant + zigzag RLE with the fixed-length tables."""
    coef = _C @ (block - 128.0) @ _C.T
    zz = np.round(coef[_ZZ_ROWS, _ZZ_COLS] / _ENC_Q).astype(int)
    t, mag = _mag_bits(int(zz[0]) - pred)
    bw.write(t, 4)
    if t:
        bw.write(mag, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(0xF0, 9)  # ZRL
            run -= 16
        t, mag = _mag_bits(v)
        bw.write((run << 4) | t, 9)
        bw.write(mag, t)
        run = 0
    if run:
        bw.write(0x00, 9)  # EOB
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_jpeg(arr: np.ndarray, subsample: bool = False,
                restart_interval: int = 0, progressive: bool = False) -> bytes:
    """Encode (h, w[, c]) uint8 (c in {1, 3}) as a baseline JPEG.

    subsample=True emits 4:2:0 (2x2-mean chroma), else 4:4:4.  A nonzero
    restart_interval emits DRI + RSTn every that-many MCUs.  progressive=True
    emits SOF2 with a 4-kind scan script (DC first Al=1, per-component AC
    first Al=1, per-component AC refinement Al=0, DC refinement Al=0) that
    exercises every progressive decode path incl. EOB runs; the quantized
    coefficients are identical to the baseline writer's, so the progressive
    and baseline encodings of the same array decode to the same pixels.
    """
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3):
        raise ValueError("jpeg encoder supports 1 or 3 channels")
    a = arr.astype(float)
    if c == 3:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            samp = [(2, 2), (1, 1), (1, 1)]
            planes = [y, _box2(cb), _box2(cr)]
        else:
            samp = [(1, 1)] * 3
            planes = [y, cb, cr]
    else:
        samp = [(1, 1)]
        planes = [a[:, :, 0]]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for (sh, sv), p in zip(samp, planes):
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        padded.append(np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                             mode="edge"))

    if progressive:
        return _encode_progressive(padded, samp, w, h, mcus_x, mcus_y,
                                   restart_interval)

    bw = _BitWriter()
    chunks: list[bytes] = []
    preds = [0] * len(planes)
    n_mcus = mcus_x * mcus_y
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            chunks.append(bytes(bw.out))
            chunks.append(bytes([0xFF, 0xD0 + (m // restart_interval - 1) % 8]))
            bw = _BitWriter()
            preds = [0] * len(planes)
        my, mx = divmod(m, mcus_x)
        for ci, ((sh, sv), p) in enumerate(zip(samp, padded)):
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    preds[ci] = _encode_block(
                        bw, p[y0:y0 + 8, x0:x0 + 8], preds[ci])
    bw.flush()
    chunks.append(bytes(bw.out))

    qtab = bytes([_ENC_Q] * 64)
    out = [b"\xff\xd8",
           _seg(0xDB, bytes([0x00]) + qtab),
           _seg(0xDB, bytes([0x01]) + qtab)]
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(planes)))
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out.append(_seg(0xC0, bytes(sof)))
    out.append(_seg(0xC4, bytes([0x00]) + _DC_COUNTS + _DC_SYMBOLS))
    out.append(_seg(0xC4, bytes([0x10]) + _AC_COUNTS + _AC_SYMBOLS))
    if len(planes) == 3:
        out.append(_seg(0xC4, bytes([0x01]) + _DC_COUNTS + _DC_SYMBOLS))
        out.append(_seg(0xC4, bytes([0x11]) + _AC_COUNTS + _AC_SYMBOLS))
    if restart_interval:
        out.append(_seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytearray([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out.append(_seg(0xDA, bytes(sos)))
    out.extend(chunks)
    out.append(b"\xff\xd9")
    return b"".join(out)


# --------------------------------------------------------------------------
# progressive encoder (T.81 Annex G mirror of the decode paths above)
# --------------------------------------------------------------------------


def _emit_eobrun(bw: _BitWriter, eobrun: int, be: list[int]) -> int:
    """Flush a pending EOBn symbol plus its buffered correction bits."""
    if eobrun:
        r = eobrun.bit_length() - 1
        bw.write(r << 4, 9)
        if r:
            bw.write(eobrun - (1 << r), r)
        for bit in be:
            bw.write(bit, 1)
        be.clear()
    return 0


def _enc_dc_scan(zz, samp, mcus_x, mcus_y, ah, al, ri) -> bytes:
    """Interleaved DC scan: first (diff of v>>Al) or refinement (bit Al)."""
    chunks: list[bytes] = []
    bw = _BitWriter()
    preds = [0] * len(zz)
    rst = 0
    for m in range(mcus_x * mcus_y):
        if ri and m and m % ri == 0:
            bw.flush()
            chunks.append(bytes(bw.out))
            chunks.append(bytes([0xFF, 0xD0 + rst % 8]))
            rst += 1
            bw = _BitWriter()
            preds = [0] * len(zz)
        my, mx = divmod(m, mcus_x)
        for ci, ((sh, sv), z) in enumerate(zip(samp, zz)):
            for by in range(sv):
                for bx in range(sh):
                    v = int(z[my * sv + by, mx * sh + bx, 0])
                    if ah == 0:
                        hi = v >> al  # arithmetic shift (G.1.2.1)
                        t, mag = _mag_bits(hi - preds[ci])
                        preds[ci] = hi
                        bw.write(t, 4)
                        if t:
                            bw.write(mag, t)
                    else:
                        bw.write((v >> al) & 1, 1)
    bw.flush()
    chunks.append(bytes(bw.out))
    return b"".join(chunks)


def _enc_ac_first(z, blocks_y, blocks_x, al, ri) -> bytes:
    """Non-interleaved AC first scan (band 1..63) with EOB-run folding."""
    chunks: list[bytes] = []
    bw = _BitWriter()
    eobrun = 0
    rst = 0
    for b in range(blocks_y * blocks_x):
        if ri and b and b % ri == 0:
            eobrun = _emit_eobrun(bw, eobrun, [])
            bw.flush()
            chunks.append(bytes(bw.out))
            chunks.append(bytes([0xFF, 0xD0 + rst % 8]))
            rst += 1
            bw = _BitWriter()
        by, bx = divmod(b, blocks_x)
        r = 0
        wrote = False
        for v in z[by, bx, 1:64]:
            v = int(v)
            tv = abs(v) >> al  # point transform truncates the MAGNITUDE
            if tv == 0:
                r += 1
                continue
            eobrun = _emit_eobrun(bw, eobrun, [])
            while r > 15:
                bw.write(0xF0, 9)  # ZRL
                r -= 16
            s, mag = _mag_bits(tv if v > 0 else -tv)
            bw.write((r << 4) | s, 9)
            bw.write(mag, s)
            r = 0
            wrote = True
        if r or not wrote:  # trailing zeros / all-zero block join an EOB run
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _emit_eobrun(bw, eobrun, [])
    eobrun = _emit_eobrun(bw, eobrun, [])
    bw.flush()
    chunks.append(bytes(bw.out))
    return b"".join(chunks)


def _enc_ac_refine(z, blocks_y, blocks_x, al, ri) -> bytes:
    """Non-interleaved AC refinement scan: newly-nonzero coefficients as
    run/1 symbols, history coefficients as buffered correction bits emitted
    after the covering symbol (ZRL / run-1 / EOBn) — the bit order the
    _refine_ac_block decoder consumes."""
    chunks: list[bytes] = []
    bw = _BitWriter()
    eobrun = 0
    be: list[int] = []  # correction bits owed to the pending EOB run
    rst = 0
    for b in range(blocks_y * blocks_x):
        if ri and b and b % ri == 0:
            eobrun = _emit_eobrun(bw, eobrun, be)
            bw.flush()
            chunks.append(bytes(bw.out))
            chunks.append(bytes([0xFF, 0xD0 + rst % 8]))
            rst += 1
            bw = _BitWriter()
        by, bx = divmod(b, blocks_x)
        vals = [int(v) for v in z[by, bx, 1:64]]
        mags = [abs(v) >> al for v in vals]
        eobpos = max((i for i, x in enumerate(mags) if x == 1), default=-1)
        r = 0
        br: list[int] = []  # correction bits since the last emitted symbol
        for i, (v, x) in enumerate(zip(vals, mags)):
            if x == 0:
                r += 1
                continue
            # ZRLs only when a newly-nonzero coefficient still follows;
            # otherwise the run folds into the EOB (libjpeg's k<=EOB guard)
            while r > 15 and i <= eobpos:
                eobrun = _emit_eobrun(bw, eobrun, be)
                bw.write(0xF0, 9)
                r -= 16
                for bit in br:
                    bw.write(bit, 1)
                br = []
            if x > 1:  # history-nonzero: one correction bit, run unaffected
                br.append(x & 1)
                continue
            eobrun = _emit_eobrun(bw, eobrun, be)
            bw.write((r << 4) | 1, 9)
            bw.write(1 if v > 0 else 0, 1)
            for bit in br:
                bw.write(bit, 1)
            br = []
            r = 0
        if r or br:
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF:
                eobrun = _emit_eobrun(bw, eobrun, be)
    eobrun = _emit_eobrun(bw, eobrun, be)
    bw.flush()
    chunks.append(bytes(bw.out))
    return b"".join(chunks)


def _encode_progressive(padded, samp, w, h, mcus_x, mcus_y, ri) -> bytes:
    # quantized zigzag coefficients per component, one vectorized pass
    zz = []
    for p in padded:
        by, bx = p.shape[0] // 8, p.shape[1] // 8
        blocks = p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
        fr = np.einsum("un,yxnm,vm->yxuv", _C, blocks, _C)
        zz.append(np.round(fr[:, :, _ZZ_ROWS, _ZZ_COLS] / _ENC_Q)
                  .astype(np.int64))

    nc = len(padded)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    qtab = bytes([_ENC_Q] * 64)
    out = [b"\xff\xd8", _seg(0xDB, bytes([0x00]) + qtab),
           _seg(0xDB, bytes([0x01]) + qtab)]
    sof = bytearray(struct.pack(">BHHB", 8, h, w, nc))
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out.append(_seg(0xC2, bytes(sof)))
    out.append(_seg(0xC4, bytes([0x00]) + _DC_COUNTS + _DC_SYMBOLS))
    out.append(_seg(0xC4, bytes([0x10]) + _AC_COUNTS + _AC_SYMBOLS))
    if nc == 3:
        out.append(_seg(0xC4, bytes([0x01]) + _DC_COUNTS + _DC_SYMBOLS))
        out.append(_seg(0xC4, bytes([0x11]) + _AC_COUNTS + _AC_SYMBOLS))
    if ri:
        out.append(_seg(0xDD, struct.pack(">H", ri)))

    def sos(comp_ids, ss, se, ah, al):
        body = bytearray([len(comp_ids)])
        for ci in comp_ids:
            body += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, bytes(body))

    # component block grids for the non-interleaved AC scans
    grids = []
    for sh, sv in samp:
        ch, cw = -(-h * sv // vmax), -(-w * sh // hmax)
        grids.append((-(-ch // 8), -(-cw // 8)))

    out.append(sos(list(range(nc)), 0, 0, 0, 1))
    out.append(_enc_dc_scan(zz, samp, mcus_x, mcus_y, 0, 1, ri))
    for ci in range(nc):
        gy, gx = grids[ci]
        out.append(sos([ci], 1, 63, 0, 1))
        out.append(_enc_ac_first(zz[ci], gy, gx, 1, ri))
    for ci in range(nc):
        gy, gx = grids[ci]
        out.append(sos([ci], 1, 63, 1, 0))
        out.append(_enc_ac_refine(zz[ci], gy, gx, 0, ri))
    out.append(sos(list(range(nc)), 0, 0, 1, 0))
    out.append(_enc_dc_scan(zz, samp, mcus_x, mcus_y, 1, 0, ri))
    out.append(b"\xff\xd9")
    return b"".join(out)


def frame_spans_mjpeg(blob: bytes) -> list[tuple[int, int]]:
    """Frame byte spans [(start, end)) of a motion-JPEG elementary stream —
    concatenated baseline JPEGs, the payload format of raw .mjpeg files and
    HTTP multipart MJPEG.

    Marker-aware, not a byte-pattern scan: segment lengths are honored (a
    0xFFD9 inside a DQT/DHT/APPn payload is table data, not EOI) and
    entropy-coded data respects E.2.4 stuffing (0xFF00), RSTn and fill
    bytes, so the split is exact. Raises ValueError on truncation or
    garbage; callers surface that as error-as-data
    (operators/multimodal.py contract).
    """
    spans: list[tuple[int, int]] = []
    n = len(blob)
    pos = 0
    while pos < n:
        if blob[pos:pos + 2] != b"\xff\xd8":
            raise ValueError("mjpeg_bad_frame_start")
        start = pos
        pos += 2
        in_scan = False
        while True:
            if in_scan:
                if pos >= n:
                    raise ValueError("mjpeg_truncated_frame")
                if blob[pos] != 0xFF:
                    pos += 1
                    continue
                if pos + 1 >= n:
                    raise ValueError("mjpeg_truncated_frame")
                m = blob[pos + 1]
                if m == 0x00 or 0xD0 <= m <= 0xD7:
                    pos += 2
                    continue
                if m == 0xFF:  # fill byte
                    pos += 1
                    continue
                in_scan = False  # any true marker ends the scan
                continue
            if pos + 2 > n:
                raise ValueError("mjpeg_truncated_frame")
            if blob[pos] != 0xFF:
                raise ValueError("mjpeg_bad_marker")
            m = blob[pos + 1]
            if m == 0xD9:  # EOI — frame complete
                pos += 2
                spans.append((start, pos))
                break
            if m == 0x01 or 0xD0 <= m <= 0xD8 or m == 0xFF:
                pos += 2 if m != 0xFF else 1
                continue
            if pos + 4 > n:
                raise ValueError("mjpeg_truncated_frame")
            (seglen,) = struct.unpack_from(">H", blob, pos + 2)
            if seglen < 2 or pos + 2 + seglen > n:
                raise ValueError("mjpeg_truncated_frame")
            if m == 0xDA:
                in_scan = True
            pos += 2 + seglen
    return spans


def _box2(p: np.ndarray) -> np.ndarray:
    """2x2 box-mean downsample with edge replication for odd sizes."""
    h, w = p.shape
    if h % 2 or w % 2:
        p = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
    return 0.25 * (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])
