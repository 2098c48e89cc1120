"""Baseline JPEG decoder with only the stdlib + numpy.

Closes the last stubbed common image format in the multimodal pipeline
(SURVEY.md LLM-pipeline family; the container forbids codec libraries —
scripts/DECODER_ATTEMPTS.md). Everything here is from the public JPEG
specification (ITU-T T.81): marker segment parse, canonical Huffman
entropy decode (DC differential + AC run-length in zigzag order),
dequantization, 8x8 inverse DCT as two numpy matrix multiplies, chroma
upsampling, and JFIF full-range YCbCr -> RGB.

Supported subset — the overwhelmingly dominant web/camera shapes:
baseline and extended-sequential Huffman frames (SOF0/SOF1) AND
progressive Huffman frames (SOF2, round 15: spectral selection +
successive approximation per T.81 Annex G, including EOB runs,
AC refinement correction bits, interleaved and single-component DC
scans, restart markers mid-scan), 8-bit precision, 1 or 3 components,
any sampling factors. ``ValueError`` on anything else (hierarchical,
arithmetic coding, lossless, 12-bit) so the caller's dispatch can
fall back — mirroring the PNG decoder's contract in
``operators.multimodal``.

Throughput note: entropy decoding is an inherently sequential bit
stream, so this pure-Python path is for correctness and for the sealed
container; at 100 TB the decode UDF dispatches to PIL/libjpeg when the
cluster image has it (see ``multimodal._decode_image``) and this module
is the dependency-free floor, not the hot path.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8"

# zigzag index: ZIGZAG[k] = natural (row*8+col) position of the k-th
# coefficient in scan order (T.81 Figure A.6).
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal 8-point DCT-II basis: M[u, x] = c(u)/2 * cos((2x+1)u*pi/16).
# Inverse transform of a coefficient block B is M.T @ B @ M.
_M = np.zeros((8, 8), dtype=np.float64)
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _build_huffman(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman map {(bit length, code): symbol} from a DHT
    segment's 16 length counts + symbol list (T.81 Annex C)."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (byte
    stuffing already removed by the caller)."""

    __slots__ = ("data", "pos", "bits", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bits = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            byte = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.bits = (self.bits << 8) | byte
            self.nbits += 8
        self.nbits -= n
        out = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return out

    def huffman(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """DC/AC magnitude decode (T.81 F.2.2.1): s-bit value v to signed."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _entropy_segments(data: bytes, start: int) -> list[bytes]:
    """Split the scan's entropy bytes into restart segments, removing
    0xFF00 byte stuffing. Ends at the first real (non-RST) marker."""
    return _entropy_segments_end(data, start)[0]


def _entropy_segments_end(data: bytes, start: int) -> tuple[list[bytes], int]:
    """``_entropy_segments`` plus the index of the terminating marker's
    0xFF — the progressive decoder resumes marker parsing there."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:  # stuffed data byte
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # restart marker
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # real marker: end of scan
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs, min(i, n)


def decode_jpeg(data: bytes) -> np.ndarray:
    """(H, W, channels) uint8 array from baseline JPEG bytes — channels
    is 3 (RGB) for YCbCr images, 1 for grayscale. ValueError outside the
    supported subset (see module docstring)."""
    if data[:2] != JPEG_MAGIC:
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    scan_comps = None
    restart_interval = 0
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = data[i + 1]
        i += 2
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[i : i + 2])
        seg = data[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                    p += 64
                elif pq == 1:
                    tbl = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
                else:
                    raise ValueError("bad DQT precision")
                qt[tq] = tbl  # zigzag order, as stored
        elif marker == 0xC4:  # DHT — possibly several tables
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                total = sum(counts)
                symbols = seg[p + 17 : p + 17 + total]
                huff[(tc, th)] = _build_huffman(counts, symbols)
                p += 17 + total
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. sequential
            precision, height, width, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack(">BBB", seg[6 + 3 * c : 9 + 3 * c])
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {ncomp}")
            frame = {"h": height, "w": width, "comps": comps}
        elif marker == 0xC2:  # progressive: multi-scan path (round 15)
            return _decode_progressive(data)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{marker - 0xC0} "
                "(hierarchical/arithmetic/lossless)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan_comps.append(
                    {**comp, "dc": tables >> 4, "ac": tables & 15}
                )
            if len(scan_comps) != len(frame["comps"]):
                raise ValueError("unsupported JPEG multi-scan layout")
            i += seglen
            break
        i += seglen
    if frame is None or scan_comps is None:
        raise ValueError("truncated JPEG (no frame/scan)")

    segs = _entropy_segments(data, i)
    h_img, w_img = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in scan_comps
    ]
    for c in scan_comps:
        if (0, c["dc"]) not in huff or (1, c["ac"]) not in huff:
            raise ValueError("missing JPEG Huffman table")
        if c["tq"] not in qt:
            raise ValueError("missing JPEG quantization table")

    seg_idx = 0
    reader = _BitReader(segs[0])
    pred = [0] * len(scan_comps)
    n_mcus = mcus_x * mcus_y
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing JPEG restart segment")
            reader = _BitReader(segs[seg_idx])
            pred = [0] * len(scan_comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, comp in enumerate(scan_comps):
            dc_tbl = huff[(0, comp["dc"])]
            ac_tbl = huff[(1, comp["ac"])]
            q = qt[comp["tq"]]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    zz = np.zeros(64, dtype=np.int32)
                    s = reader.huffman(dc_tbl)
                    if s > 11:
                        raise ValueError("bad JPEG DC category")
                    diff = _extend(reader.read(s), s) if s else 0
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = reader.huffman(ac_tbl)
                        r, size = rs >> 4, rs & 15
                        if size == 0:
                            if r == 15:  # ZRL: sixteen zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        zz[k] = _extend(reader.read(size), size)
                        k += 1
                    block = np.zeros(64, dtype=np.float64)
                    block[ZIGZAG] = (zz * q).astype(np.float64)
                    block = block.reshape(8, 8)
                    spatial = _M.T @ block @ _M + 128.0
                    y0 = (my * comp["v"] + by) * 8
                    x0 = (mx * comp["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial

    full = []
    for ci, comp in enumerate(scan_comps):
        p = planes[ci]
        if comp["h"] != hmax or comp["v"] != vmax:
            p = p.repeat(vmax // comp["v"], axis=0).repeat(
                hmax // comp["h"], axis=1
            )
        full.append(p[:h_img, :w_img])
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoding — T.81 Annex G, successive approximation
# + spectral selection. Coefficients for every block of every component
# accumulate across scans in ZIGZAG order; reconstruction happens once
# at the end. Algorithm structure follows the public spec (figures
# G.3-G.7) and the reference decoder's (libjpeg jdphuff.c) published
# handling of EOB runs and correction bits. Round 15: this closes the
# progressive gate the baseline decoder documented.
# ---------------------------------------------------------------------------


def _ac_first(reader, blk, Ss, Se, Al, tbl, eobrun):
    """One block of an AC first scan (Ah=0): T.81 G.1.2.2 with EOBn
    run-length codes. ``blk`` is the block's 64 zigzag coefficients
    (modified in place); returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        rs = reader.huffman(tbl)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > Se:
            raise ValueError("JPEG AC index past Se in progressive scan")
        blk[k] = _extend(reader.read(s), s) << Al
        k += 1
    return eobrun


def _ac_refine(reader, blk, Ss, Se, Al, tbl, eobrun):
    """One block of an AC refinement scan (Ah>0): T.81 G.1.2.3.
    Nonzero-history coefficients receive one correction bit each as
    the scan passes them; newly-nonzero coefficients arrive as ±1
    scaled by 2^Al. Returns the remaining EOB run (blocks whose band
    holds no NEW nonzero coefficient — their history coefficients
    still receive correction bits)."""
    p1 = 1 << Al
    m1 = -1 << Al
    k = Ss
    if eobrun == 0:
        while k <= Se:
            rs = reader.huffman(tbl)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read(r)
                    break  # current block finishes in the EOB tail
                # ZRL: skip 16 zero-history positions (refining
                # nonzero-history ones on the way, uncounted)
            else:
                if s != 1:
                    raise ValueError("bad JPEG AC refinement magnitude")
                newval = p1 if reader.read(1) else m1
            while k <= Se:
                v = int(blk[k])
                if v != 0:
                    if reader.read(1) and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= Se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= Se:
            v = int(blk[k])
            if v != 0:
                if reader.read(1) and (v & p1) == 0:
                    blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _comp_block_dims(frame, comp, hmax, vmax):
    """(block rows, block cols) of one component in a NON-interleaved
    scan: ceil(component sample dims / 8) per T.81 A.2.2 — smaller
    than the padded interleaved MCU grid when dims don't divide."""
    cw = -(-frame["w"] * comp["h"] // hmax)
    ch = -(-frame["h"] * comp["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_progressive(data: bytes) -> np.ndarray:
    """(H, W, channels) uint8 from a progressive (SOF2) JPEG — same
    output contract as ``decode_jpeg``, which dispatches here."""
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    coefs: list[np.ndarray] = []
    geom = None
    restart_interval = 0
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = data[i + 1]
        i += 2
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[i : i + 2])
        seg = data[i + 2 : i + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                    p += 64
                elif pq == 1:
                    tbl = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
                else:
                    raise ValueError("bad DQT precision")
                qt[tq] = tbl
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                total = sum(counts)
                symbols = seg[p + 17 : p + 17 + total]
                huff[(tc, th)] = _build_huffman(counts, symbols)
                p += 17 + total
        elif marker == 0xC2:
            precision, height, width, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {ncomp}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack(">BBB", seg[6 + 3 * c : 9 + 3 * c])
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": height, "w": width, "comps": comps}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-width // (8 * hmax))
            mcus_y = -(-height // (8 * vmax))
            geom = (mcus_x, mcus_y, hmax, vmax)
            coefs = [
                np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int32)
                for c in comps
            ]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unexpected frame type inside progressive decode"
            )
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("JPEG SOS before SOF2")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                ix = next(
                    j for j, x in enumerate(frame["comps"]) if x["id"] == cs
                )
                scan_comps.append(
                    {**frame["comps"][ix], "ix": ix,
                     "dc": tables >> 4, "ac": tables & 15}
                )
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            i = _progressive_scan(
                data, i + seglen, frame, scan_comps, ss, se, ah, al,
                huff, coefs, restart_interval, geom,
            )
            continue
        i += seglen
    if frame is None:
        raise ValueError("truncated progressive JPEG (no frame)")
    return _reconstruct_from_coefs(frame, coefs, qt, geom)


def _progressive_scan(
    data, start, frame, scan_comps, ss, se, ah, al,
    huff, coefs, restart_interval, geom,
):
    """Decode one progressive scan's entropy data into ``coefs``;
    returns the offset of the next marker. Scan-type dispatch per
    T.81 G.1.2: DC first/refine (Ss=0, interleaved or single), AC
    first/refine (Ss>0, exactly one component)."""
    mcus_x, mcus_y, hmax, vmax = geom
    segs, end = _entropy_segments_end(data, start)
    seg_idx = 0
    reader = _BitReader(segs[0])

    def restart(unit):
        nonlocal seg_idx, reader
        if restart_interval and unit and unit % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing JPEG restart segment")
            reader = _BitReader(segs[seg_idx])
            return True
        return False

    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        for c in scan_comps:
            if ah == 0 and (0, c["dc"]) not in huff:
                raise ValueError("missing JPEG DC Huffman table")
        pred = [0] * len(scan_comps)

        def dc_block(blk, ci, c):
            if ah == 0:
                s = reader.huffman(huff[(0, c["dc"])])
                if s > 11:
                    raise ValueError("bad JPEG DC category")
                pred[ci] += _extend(reader.read(s), s) if s else 0
                blk[0] = pred[ci] << al
            else:
                if reader.read(1):
                    blk[0] |= 1 << al

        if len(scan_comps) > 1:  # interleaved MCU order
            for mcu in range(mcus_x * mcus_y):
                if restart(mcu):
                    pred = [0] * len(scan_comps)
                my, mx = divmod(mcu, mcus_x)
                for ci, c in enumerate(scan_comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            dc_block(
                                coefs[c["ix"]][
                                    my * c["v"] + by, mx * c["h"] + bx
                                ],
                                ci, c,
                            )
        else:
            c = scan_comps[0]
            bh, bw = _comp_block_dims(frame, c, hmax, vmax)
            for unit in range(bh * bw):
                if restart(unit):
                    pred = [0] * len(scan_comps)
                by, bx = divmod(unit, bw)
                dc_block(coefs[c["ix"]][by, bx], 0, c)
    else:
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scan must cover one component")
        c = scan_comps[0]
        if (1, c["ac"]) not in huff:
            raise ValueError("missing JPEG AC Huffman table")
        tbl = huff[(1, c["ac"])]
        bh, bw = _comp_block_dims(frame, c, hmax, vmax)
        eobrun = 0
        for unit in range(bh * bw):
            if restart(unit):
                eobrun = 0
            by, bx = divmod(unit, bw)
            blk = coefs[c["ix"]][by, bx]
            if ah == 0:
                eobrun = _ac_first(reader, blk, ss, se, al, tbl, eobrun)
            else:
                eobrun = _ac_refine(reader, blk, ss, se, al, tbl, eobrun)
    return end


def _reconstruct_from_coefs(frame, coefs, qt, geom) -> np.ndarray:
    """Dequantize + IDCT every component's coefficient grid and finish
    with the baseline tail (crop, upsample, YCbCr→RGB). Vectorized:
    one einsum over all blocks per component."""
    mcus_x, mcus_y, hmax, vmax = geom
    h_img, w_img = frame["h"], frame["w"]
    full = []
    for ci, comp in enumerate(frame["comps"]):
        if comp["tq"] not in qt:
            raise ValueError("missing JPEG quantization table")
        zz = coefs[ci] * qt[comp["tq"]][None, None, :]
        nat = np.zeros_like(zz, dtype=np.float64)
        nat[:, :, ZIGZAG] = zz.astype(np.float64)
        by, bx = nat.shape[0], nat.shape[1]
        blocks = nat.reshape(by, bx, 8, 8)
        spatial = np.einsum("ij,xyjk,kl->xyil", _M.T, blocks, _M) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        if comp["h"] != hmax or comp["v"] != vmax:
            plane = plane.repeat(vmax // comp["v"], axis=0).repeat(
                hmax // comp["h"], axis=1
            )
        full.append(plane[:h_img, :w_img])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
