"""Baseline JPEG codec from the public spec (ITU-T T.81), stdlib-only.

Closes the last real-codec gate in the multimodal lane: the reference
workload never touches JPEG (``species_range_etl.py`` is raster/vector
only), but a training-data corpus is full of them, and the builder's brief
makes image decode a first-class component.  Same no-dependency style as
``pipeline/geotiff.py`` and ``multimodal/codecs.py``: the container ships
no image library, so the format is implemented from its published spec.

Scope — the baseline sequential DCT process plus the progressive DCT
process (T.81 Annex G), which together cover essentially all wild JPEGs:

- markers: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOF1/SOF2/SOS/RSTn/EOI
- Huffman entropy coding (canonical tables from DHT), byte stuffing,
  restart markers
- progressive scans: spectral selection (Ss..Se bands), successive
  approximation (Ah/Al bit planes) for both DC and AC, EOB runs,
  interleaved DC scans, restart intervals inside any scan kind
- 8-bit and 12-bit samples (12-bit reduces to the 8-bit output domain
  through the quantization divide; 16-bit DQT tables supported),
  grayscale or YCbCr (BT.601), integer-ratio chroma subsampling
  (4:4:4, 4:2:2, 4:2:0) with nearest-neighbor upsampling
- loud gates: hierarchical/lossless/arithmetic frames, fractional
  sampling ratios

The encoder (used for golden round-trip tests and as a real sink) writes
baseline 4:4:4 with IJG-scaled Annex-K quantization tables and
*constructed* fixed-length Huffman tables: every used symbol gets the same
code length L = ceil(log2(n_symbols + 1)), which is a valid canonical
table any decoder accepts (compression is a few percent worse than the
optimized tables; correctness and zero transcription risk are worth it).

Performance: entropy decode is bit-at-a-time Python — fine for the test
fixtures and for metadata-sized thumbnails, and the Spark plumbing around
the seam (mapInPandas batching, error side-channels) is the part that has
to be right at 100 TB.  For bulk corpora, plug a native decoder into
``media._decode_payload``; nothing else changes.
"""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = [
    "decode_jpeg",
    "encode_jpeg",
    "encode_jpeg_progressive",
    "jpeg_is_progressive",
]


def _zigzag() -> np.ndarray:
    """Flat (row*8+col) index for each zigzag position, derived from the
    traversal rule (up-right on even anti-diagonals) instead of a 64-entry
    transcribed constant."""
    cells = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (
            rc[0] + rc[1],
            -rc[0] if (rc[0] + rc[1]) % 2 == 0 else rc[0],
        ),
    )
    return np.array([r * 8 + c for r, c in cells], dtype=np.int64)


_ZZ = _zigzag()

# Separable DCT-II basis: spatial = A.T @ coeff @ A, coeff = A @ spatial @ A.T
_U, _X = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
_A = 0.5 * np.cos((2 * _X + 1) * _U * np.pi / 16)
_A[0] *= 1.0 / math.sqrt(2.0)

# Annex K quantization tables (luminance / chrominance), row-major.
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
_Q_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32,
    dtype=np.float64,
)


# ---------------------------------------------------------------- decode


class _BitReader:
    """Entropy-segment bit reader: un-stuffs FF 00, stops at any other
    marker (recorded in ``self.marker``) and pads with 1-bits past it, as
    the spec's fill-bit rule allows."""

    #: fill bytes tolerated past the end of real entropy data — the spec
    #: allows a handful of 1-fill bits; a decoder still hungry after this
    #: is chewing on a truncated file with oversized declared dimensions,
    #: and must fail instead of looping over millions of phantom MCUs
    _MAX_PAD_BYTES = 64

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0
        self.marker: int | None = None
        self.padded = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._next_byte()
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def _next_byte(self) -> None:
        if self.marker is None and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:
                    self.marker = nxt
                    self.pos += 1
                    self.cur, self.nbits = 0xFF, 8  # fill bits past marker
                    return
            self.cur, self.nbits = b, 8
        else:
            self.padded += 1
            if self.padded > self._MAX_PAD_BYTES:
                raise ValueError(
                    "truncated entropy segment (declared image larger than "
                    "encoded data)"
                )
            self.cur, self.nbits = 0xFF, 8

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self, expected: int) -> None:
        """Discard fill bits, consume the RSTn marker, resume entropy data."""
        if self.marker is None:
            # marker not yet hit during padding: it must be next in the raw
            # stream (possibly after fill bits already buffered)
            self.nbits = 0
            if (
                self.pos + 1 < len(self.data)
                and self.data[self.pos] == 0xFF
            ):
                self.marker = self.data[self.pos + 1]
                self.pos += 2
        self.nbits = 0
        if self.marker != 0xD0 + expected:
            found = f"{self.marker:#x}" if self.marker is not None else "none"
            raise ValueError(f"expected RST{expected} marker, found {found}")
        self.marker = None


def _build_decode_table(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman: BITS[1..16] counts + values -> {(len, code): sym}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _decode_sym(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy segment")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1: map the `size`-bit magnitude to its signed value."""
    if size and v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode_jpeg(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """JPEG bytes -> (width, height, channels, uint8 (h, w, c) array) —
    the same contract as ``codecs.decode_png``.  ``ValueError`` on
    malformed input (including truncations and bit flips, normalized
    from the struct layer), ``NotImplementedError`` on non-baseline
    processes."""
    try:
        return _decode_jpeg(blob)
    except (struct.error, IndexError, KeyError, StopIteration, OverflowError) as exc:
        # KeyError: scan references an undeclared quant/huffman table;
        # StopIteration: scan references a component absent from the SOF;
        # OverflowError: corrupt Al/DC-diff drives a coefficient past the
        # int32 buffer (valid streams fit in well under 32 bits)
        raise ValueError(f"malformed JPEG: {exc!r}") from exc


def _decode_jpeg(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    coefs: dict[int, np.ndarray] | None = None
    saw_scan = False
    restart_interval = 0
    while pos + 1 < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        while pos + 1 < len(blob) and blob[pos + 1] == 0xFF:
            pos += 1  # B.1.1.2: any number of FF fill bytes may pad a marker
        if pos + 1 >= len(blob):
            break
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", blob, pos)
        seg = blob[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT, possibly several tables per segment
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                off += 1
                if pq == 0:
                    table = np.frombuffer(seg, np.uint8, 64, off).astype(np.float64)
                    off += 64
                elif pq == 1:
                    table = np.frombuffer(seg, ">u2", 64, off).astype(np.float64)
                    off += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                qt[tq] = table  # zigzag order, as stored
        elif marker == 0xC4:  # DHT, possibly several tables per segment
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = seg[off + 17 : off + 17 + n]
                huff[(tc, th)] = _build_decode_table(bits, vals)
                off += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext.seq / progressive
            prec, height, width, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec not in (8, 12):
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tqi = struct.unpack_from("BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tqi})
            frame = {
                "w": width,
                "h": height,
                "comps": comps,
                "prec": prec,
                "progressive": marker == 0xC2,
            }
            if frame["progressive"]:
                coefs = _alloc_progressive(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG frame (SOF marker {marker:#x}) not supported"
            )
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            nscan = seg[0]
            scan = []
            for i in range(nscan):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0xF))
            if not frame["progressive"]:
                return _decode_scan(blob, pos, frame, scan, qt, huff, restart_interval)
            ss, se, ahal = seg[1 + 2 * nscan : 4 + 2 * nscan]
            pos = _decode_prog_scan(
                blob, pos, frame, scan, huff, restart_interval,
                coefs, ss, se, ahal >> 4, ahal & 0xF,
            )
            saw_scan = True
        # APPn / COM / others: skipped
    if saw_scan:
        return _finish_progressive(frame, coefs, qt)
    raise ValueError("no SOS scan in JPEG stream")


def _decode_scan(blob, pos, frame, scan, qt, huff, restart_interval):
    width, height = frame["w"], frame["h"]
    qdiv = float(1 << (frame.get("prec", 8) - 8))
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    # plausibility bound BEFORE allocating planes: a baseline block costs
    # >= 2 bits (DC code + EOB), so declared dimensions needing more
    # blocks than the remaining bytes could hold are a corrupt SOF, not a
    # huge image — fail instead of allocating gigabytes
    n_blocks = mcux * mcuy * sum(c["h"] * c["v"] for c, _, _ in scan)
    if n_blocks > 4 * max(1, len(blob) - pos) + 64:
        raise ValueError(
            f"declared dimensions need {n_blocks} blocks but only "
            f"{len(blob) - pos} entropy bytes exist"
        )
    planes = {
        c["id"]: np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c, _, _ in scan
    }
    for c, _, _ in scan:
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError(
                f"fractional sampling ratio {c['h']}x{c['v']} vs {hmax}x{vmax}"
            )
    reader = _BitReader(blob, pos)
    preds = {c["id"]: 0 for c, _, _ in scan}
    # loop-invariant: one scaled table per component, hoisted out of the
    # MCU loop (dividing 64 floats per block again would dominate the
    # hot path, and qdiv is 1.0 for every 8-bit file)
    qcomp = {c["id"]: qt[c["tq"]] / qdiv for c, _, _ in scan}
    rst_n = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                reader.sync_restart(rst_n)
                rst_n = (rst_n + 1) & 7
                preds = dict.fromkeys(preds, 0)
                mcu_count = 0
            mcu_count += 1
            for comp, td, ta in scan:
                cid = comp["id"]
                q = qcomp[cid]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        block, preds[cid] = _decode_block(
                            reader, huff[(0, td)], huff[(1, ta)], q, preds[cid]
                        )
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
    return _assemble_planes(
        [(comp, planes[comp["id"]]) for comp, _, _ in scan],
        hmax, vmax, width, height,
    )


def _assemble_planes(comp_planes, hmax, vmax, width, height):
    """Full-resolution upsample + crop + color conversion shared by the
    baseline and progressive reconstruction paths."""
    out = []
    for comp, plane in comp_planes:
        plane = np.repeat(plane, hmax // comp["h"], axis=1)
        plane = np.repeat(plane, vmax // comp["v"], axis=0)
        out.append(plane[:height, :width])
    if len(out) == 1:
        px = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)[..., None]
        return width, height, 1, px
    if len(out) != 3:
        raise NotImplementedError(f"{len(out)}-component JPEG not supported")
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return width, height, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------- progressive (Annex G)

#: cap on total 8x8 blocks across components before allocating the
#: progressive coefficient buffers — EOB runs make entropy length useless
#: as a plausibility bound (2 bytes can cover 32767 blocks), so a corrupt
#: SOF2 with huge declared dimensions must be stopped at allocation time
_MAX_PROGRESSIVE_BLOCKS = 1 << 22


def _alloc_progressive(frame) -> dict[int, np.ndarray]:
    """Per-component (block_rows, block_cols, 64) int32 coefficient
    buffers, sized to the padded MCU grid (interleaved DC scans address
    the padding; non-interleaved scans touch only the true grid)."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    total = mcux * mcuy * sum(c["h"] * c["v"] for c in frame["comps"])
    if total > _MAX_PROGRESSIVE_BLOCKS:
        raise ValueError(
            f"progressive frame declares {total} blocks "
            f"(> {_MAX_PROGRESSIVE_BLOCKS} cap)"
        )
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    }


def _prog_units(frame, scan, ss):
    """Scan order per T.81: DC scans with several components walk MCUs
    (touching the padded grid); single-component scans walk the
    component's own block grid in raster order.  Yields per-unit lists of
    (comp, td, ta, block_row, block_col); one unit = one restart step."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if ss == 0 and len(scan) > 1:
        mcux = -(-frame["w"] // (8 * hmax))
        mcuy = -(-frame["h"] // (8 * vmax))
        for my in range(mcuy):
            for mx in range(mcux):
                yield [
                    (comp, td, ta, my * comp["v"] + by, mx * comp["h"] + bx)
                    for comp, td, ta in scan
                    for by in range(comp["v"])
                    for bx in range(comp["h"])
                ]
    else:
        comp, td, ta = scan[0]
        cw = -(-(frame["w"] * comp["h"]) // hmax)
        ch = -(-(frame["h"] * comp["v"]) // vmax)
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                yield [(comp, td, ta, by, bx)]


def _decode_prog_scan(
    blob, pos, frame, scan, huff, restart_interval, coefs, ss, se, ah, al
):
    """One progressive scan into the coefficient buffers; returns the
    stream offset of the marker following the entropy segment."""
    if ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if ss > 0 and len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if not (ss <= se <= 63):
        raise ValueError(f"bad spectral band {ss}..{se}")
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    for comp, _, _ in scan:
        if hmax % comp["h"] or vmax % comp["v"]:
            raise NotImplementedError(
                f"fractional sampling ratio {comp['h']}x{comp['v']} "
                f"vs {hmax}x{vmax}"
            )
    reader = _BitReader(blob, pos)
    state = {"eobrun": 0}
    preds = {comp["id"]: 0 for comp, _, _ in scan}
    rst_n = 0
    count = 0
    for unit in _prog_units(frame, scan, ss):
        if restart_interval and count == restart_interval:
            reader.sync_restart(rst_n)
            rst_n = (rst_n + 1) & 7
            preds = dict.fromkeys(preds, 0)
            state["eobrun"] = 0
            count = 0
        count += 1
        for comp, td, ta, by, bx in unit:
            block = coefs[comp["id"]][by, bx]
            if ss == 0:
                if ah == 0:  # DC first: diffs at reduced precision
                    t = _decode_sym(reader, huff[(0, td)])
                    preds[comp["id"]] += _extend(reader.receive(t), t)
                    block[0] = preds[comp["id"]] << al
                elif reader.read_bit():  # DC refine: one bit per block
                    block[0] |= 1 << al
            elif ah == 0:
                _first_ac(reader, huff[(1, ta)], block, ss, se, al, state)
            else:
                _refine_ac(reader, huff[(1, ta)], block, ss, se, al, state)
    # locate the next marker: the reader either already consumed it (into
    # .marker while padding) or it sits ahead of the last entropy byte
    if reader.marker is not None:
        return reader.pos - 2
    p = reader.pos
    while p + 1 < len(blob) and not (
        blob[p] == 0xFF and blob[p + 1] != 0x00
    ):
        p += 1
    return p


def _first_ac(reader, actab, block, ss, se, al, state):
    """AC scan with Ah=0 (G.1.2.2): band coefficients at Al precision,
    zero runs + EOB-run coding across blocks."""
    if state["eobrun"]:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_sym(reader, actab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:  # EOBn: run of (1<<r)-1+ext blocks ends here
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += reader.receive(r)
                return
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC coefficient past Se")
            block[k] = _extend(reader.receive(s), s) << al
            k += 1


def _refine_nonzero(reader, block, k, p1):
    """Correction bit for a coefficient already nonzero in prior scans."""
    if reader.read_bit() and not (int(block[k]) & p1):
        block[k] += p1 if block[k] >= 0 else -p1


def _refine_ac(reader, actab, block, ss, se, al, state):
    """AC successive-approximation refinement (G.1.2.3): newly-nonzero
    coefficients arrive as (run, 1) symbols with a sign bit; every
    coefficient made nonzero by earlier scans absorbs one correction bit
    as the run advances past it, including through EOB runs."""
    p1 = 1 << al
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        for k in range(ss, se + 1):
            if block[k]:
                _refine_nonzero(reader, block, k, p1)
        return
    k = ss
    while k <= se:
        rs = _decode_sym(reader, actab)
        r, s = rs >> 4, rs & 0xF
        sval = 0
        if s == 0:
            if r < 15:  # EOB run starts; current block still needs its bits
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += reader.receive(r)
                for kk in range(k, se + 1):
                    if block[kk]:
                        _refine_nonzero(reader, block, kk, p1)
                return
            # r == 15: ZRL — skip 16 zero-history coefficients
        else:
            if s != 1:
                raise ValueError("bad AC refinement symbol")
            sval = p1 if reader.read_bit() else -p1
        while k <= se:
            if block[k]:
                _refine_nonzero(reader, block, k, p1)
            else:
                if r == 0:
                    if sval:
                        block[k] = sval
                    k += 1
                    break
                r -= 1
            k += 1


def _finish_progressive(frame, coefs, qt):
    """Dequantize + IDCT the accumulated coefficient planes."""
    width, height = frame["w"], frame["h"]
    qdiv = float(1 << (frame.get("prec", 8) - 8))
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    out = []
    for comp in frame["comps"]:
        deq = (
            coefs[comp["id"]].astype(np.float64)
            * (qt[comp["tq"]] / qdiv)[None, None, :]
        )
        bh, bw = deq.shape[:2]
        dez = np.zeros_like(deq)
        dez[:, :, _ZZ] = deq
        spatial = (
            np.einsum("ij,xyjk,kl->xyil", _A.T, dez.reshape(bh, bw, 8, 8), _A)
            + 128.0
        )
        out.append((comp, spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)))
    return _assemble_planes(out, hmax, vmax, width, height)


def _decode_block(reader, dc_table, ac_table, q, pred):
    t = _decode_sym(reader, dc_table)
    pred += _extend(reader.receive(t), t)
    coef = np.zeros(64, dtype=np.float64)
    coef[0] = pred * q[0]
    k = 1
    while k < 64:
        rs = _decode_sym(reader, ac_table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC coefficient index past 63")
        coef[k] = _extend(reader.receive(s), s) * q[k]
        k += 1
    block = np.zeros(64, dtype=np.float64)
    block[_ZZ] = coef
    spatial = _A.T @ block.reshape(8, 8) @ _A + 128.0
    return spatial, pred


# ---------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # 1-fill


def _fixed_length_table(symbols: set[int]) -> tuple[list[int], list[int], dict[int, tuple[int, int]]]:
    """All used symbols at one code length L with 2^L - 1 >= n (the
    all-ones code stays unused, as T.81 tables conventionally do).
    Returns (BITS[1..16], values, {sym: (code, length)})."""
    vals = sorted(symbols)
    n = len(vals)
    length = max(1, math.ceil(math.log2(n + 1)))
    bits = [0] * 16
    bits[length - 1] = n
    enc = {sym: (i, length) for i, sym in enumerate(vals)}
    return bits, vals, enc


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


def _dqt_payload(tq: int, table) -> bytes:
    """DQT payload: 8-bit entries when they fit, else pq=1 16-bit."""
    if table.max() > 255:
        return bytes([0x10 | tq]) + b"".join(
            int(v).to_bytes(2, "big") for v in table
        )
    return bytes([tq]) + bytes(int(v) for v in table)


def _mag_bits(v: int) -> tuple[int, int]:
    """Signed value -> (size, magnitude bits) per the extend convention."""
    size = abs(v).bit_length()
    return size, v if v >= 0 else v + (1 << size) - 1


def _block_symbols(qblk: np.ndarray, pred: int):
    """Quantized zigzag block -> ((dc_size, dc_mag), [(ac_sym, (s, m))...],
    new_pred) — the T.81 run/size symbol stream for one block."""
    dc = int(qblk[0])
    size, mag = _mag_bits(dc - pred)
    acs = []
    run = 0
    last_nz = int(np.max(np.nonzero(qblk)[0])) if np.any(qblk[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(qblk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, (0, 0)))  # ZRL
            run -= 16
        s, m = _mag_bits(v)
        acs.append(((run << 4) | s, (s, m)))
        run = 0
    if last_nz < 63:
        acs.append((0x00, (0, 0)))  # EOB
    return (size, mag), acs, dc


def _prepare_blocks(
    px: np.ndarray, quality: int, subsampling: tuple[int, int],
    precision: int = 8,
):
    """Color-convert, subsample, pad, and forward-DCT-quantize: the shared
    front half of the baseline and progressive encoders.  Returns
    (h, w, ncomp, factors, comp_class, qtabs, comp_blocks, mcux, mcuy).

    ``precision=12`` scales samples AND quantization tables by 16, which
    leaves the quantized coefficients — hence the entire entropy stream —
    byte-identical to the 8-bit encode of the same image; the decoder
    divides the (16-bit DQT) tables back down, so the 12-bit twin decodes
    pixel-identically to the 8-bit one."""
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    if px.ndim == 2:
        px = px[..., None]
    h, w, c = px.shape
    if c not in (1, 3):
        raise ValueError(f"unsupported channel count {c}")
    f = px.astype(np.float64)
    if c == 3:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        sh, sv = subsampling
        if sh not in (1, 2) or sv not in (1, 2):
            raise ValueError(f"unsupported subsampling {subsampling}")
        factors = [(sh, sv), (1, 1), (1, 1)]
    else:
        planes = [f[..., 0]]
        factors = [(1, 1)]
    ncomp = len(planes)
    comp_class = [0] + [1] * (ncomp - 1)
    pscale = 1 << (precision - 8)
    if pscale > 1:
        planes = [pl * pscale for pl in planes]  # linear: chroma +128 -> +2048
    qtabs = [_scale_q(_Q_LUMA[_ZZ], quality) * pscale]  # zigzag order
    if ncomp == 3:
        qtabs.append(_scale_q(_Q_CHROMA[_ZZ], quality) * pscale)
    hmax = max(fh for fh, _ in factors)
    vmax = max(fv for _, fv in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component quantized zigzag blocks, keyed by (block_row, block_col)
    comp_blocks: list[dict[tuple[int, int], np.ndarray]] = []
    for ci, plane in enumerate(planes):
        fh, fv = factors[ci]
        sy, sx = vmax // fv, hmax // fh
        if sy > 1 or sx > 1:  # chroma box-mean downsample
            ph0, pw0 = -(-h // sy) * sy, -(-w // sx) * sx
            plane = np.pad(
                plane, ((0, ph0 - h), (0, pw0 - w)), mode="edge"
            ).reshape(ph0 // sy, sy, pw0 // sx, sx).mean(axis=(1, 3))
        th, tw = mcuy * 8 * fv, mcux * 8 * fh
        plane = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        q = qtabs[comp_class[ci]]
        blocks = {}
        for ry in range(th // 8):
            for rx in range(tw // 8):
                blk = (
                    plane[ry * 8 : ry * 8 + 8, rx * 8 : rx * 8 + 8]
                    - 128.0 * pscale
                )
                coef = (_A @ blk @ _A.T).reshape(64)[_ZZ]
                blocks[(ry, rx)] = np.round(coef / q).astype(np.int64)
        comp_blocks.append(blocks)
    return h, w, ncomp, factors, comp_class, qtabs, comp_blocks, mcux, mcuy


def encode_jpeg(
    px: np.ndarray,
    quality: int = 90,
    restart_interval: int = 0,
    subsampling: tuple[int, int] = (1, 1),
    precision: int = 8,
) -> bytes:
    """uint8 (h, w) / (h, w, 1) grayscale or (h, w, 3) RGB -> baseline JPEG
    bytes.  ``subsampling=(h, v)`` is the luma sampling factor relative to
    chroma: (1, 1) = 4:4:4, (2, 1) = 4:2:2, (2, 2) = 4:2:0 (chroma box-mean
    downsampled).  ``restart_interval`` > 0 emits DRI + RSTn markers every
    that many MCUs.  Both knobs exist so round-trip tests exercise the
    decoder's real-world MCU/upsampling/restart paths."""
    h, w, ncomp, factors, comp_class, qtabs, comp_blocks, mcux, mcuy = (
        _prepare_blocks(px, quality, subsampling, precision)
    )

    # one pass in MCU order -> token segments split at restart boundaries
    segments: list[list[tuple[int, int, int, list]]] = [[]]
    preds = [0] * ncomp
    since_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and since_rst == restart_interval:
                segments.append([])
                preds = [0] * ncomp
                since_rst = 0
            since_rst += 1
            for ci in range(ncomp):
                fh, fv = factors[ci]
                for by in range(fv):
                    for bx in range(fh):
                        qblk = comp_blocks[ci][(my * fv + by, mx * fh + bx)]
                        (size, mag), acs, preds[ci] = _block_symbols(
                            qblk, preds[ci]
                        )
                        segments[-1].append((comp_class[ci], size, mag, acs))

    dc_syms: list[set[int]] = [set(), set()]
    ac_syms: list[set[int]] = [set(), set()]
    for segment in segments:
        for cl, size, _mag, acs in segment:
            dc_syms[cl].add(size)
            ac_syms[cl].update(sym for sym, _ in acs)
    n_classes = 2 if ncomp == 3 else 1
    dc_tabs = [_fixed_length_table(dc_syms[i]) for i in range(n_classes)]
    ac_tabs = [_fixed_length_table(ac_syms[i]) for i in range(n_classes)]

    chunks: list[bytes] = []
    for si, segment in enumerate(segments):
        if si:
            chunks.append(bytes([0xFF, 0xD0 + ((si - 1) & 7)]))
        writer = _BitWriter()
        for cl, size, mag, acs in segment:
            code, length = dc_tabs[cl][2][size]
            writer.write(code, length)
            if size:
                writer.write(mag, size)
            for sym, (s, m) in acs:
                code, length = ac_tabs[cl][2][sym]
                writer.write(code, length)
                if s:
                    writer.write(m, s)
        writer.flush()
        chunks.append(bytes(writer.out))
    entropy = b"".join(chunks)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    for tq, table in enumerate(qtabs):
        out += seg(0xDB, _dqt_payload(tq, table))
    comps = b"".join(
        struct.pack(
            "BBB", i + 1, (factors[i][0] << 4) | factors[i][1], comp_class[i]
        )
        for i in range(ncomp)
    )
    # 12-bit requires the extended-sequential frame (SOF1)
    out += seg(
        0xC0 if precision == 8 else 0xC1,
        struct.pack(">BHHB", precision, h, w, ncomp) + comps,
    )
    for th, (bits, vals, _) in enumerate(dc_tabs):
        out += seg(0xC4, bytes([th]) + bytes(bits) + bytes(vals))
    for th, (bits, vals, _) in enumerate(ac_tabs):
        out += seg(0xC4, bytes([0x10 | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp]) + b"".join(
        struct.pack("BB", i + 1, comp_class[i] * 0x11) for i in range(ncomp)
    ) + b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------- progressive encoder

# libjpeg's default progression shape: reduced-precision DC first, luma AC
# in two spectral bands at Al=2, chroma AC at Al=1, then one refinement
# pass per plane down to full precision.  Exercises every decoder path:
# interleaved DC, DC refine, spectral selection, AC first w/ point
# transform, AC refine, EOB runs.
_PROG_SCRIPT_3 = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]
_PROG_SCRIPT_1 = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def _enc_flush_eobrun(state, toks, tab):
    """Emit the pending EOBn symbol plus the correction bits buffered for
    the blocks that the run covers (refinement scans only)."""
    n = state["eobrun"]
    if n:
        e = n.bit_length() - 1
        toks.append(("sym", tab, e << 4))
        if e:
            toks.append(("bits", n - (1 << e), e))
        toks.extend(("bits", b, 1) for b in state["pending"])
        state["eobrun"] = 0
        state["pending"] = []


def _enc_ac_first(block, ss, se, al, tab, state, toks):
    """Token stream for one block of an Ah=0 AC scan: magnitudes shifted
    toward zero by Al, zero runs, shared EOB-run accumulator."""
    r = 0
    for k in range(ss, se + 1):
        v = int(block[k])
        sval = abs(v) >> al
        if v < 0:
            sval = -sval
        if sval == 0:
            r += 1
            continue
        _enc_flush_eobrun(state, toks, tab)
        while r > 15:
            toks.append(("sym", tab, 0xF0))
            r -= 16
        s, m = _mag_bits(sval)
        toks.append(("sym", tab, (r << 4) | s))
        toks.append(("bits", m, s))
        r = 0
    if r:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _enc_flush_eobrun(state, toks, tab)


def _enc_ac_refine(block, ss, se, al, tab, state, toks):
    """Token stream for one block of an Ah=Al+1 AC refinement scan
    (G.1.2.3 encoder side): newly-nonzero coefficients (|v|>>Al == 1) as
    (run, 1) + sign bit; correction bits for older nonzeros buffered and
    emitted after the next symbol or with the EOB run that covers them."""
    absvals = [abs(int(block[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1  # position of the last NEWLY-nonzero coefficient
    for k in range(ss, se + 1):
        if absvals[k - ss] == 1:
            eob = k
    r = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        t = absvals[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _enc_flush_eobrun(state, toks, tab)
            toks.append(("sym", tab, 0xF0))
            r -= 16
            toks.extend(("bits", b, 1) for b in br)
            br = []
        if t > 1:  # nonzero before this scan: one correction bit
            br.append(t & 1)
            continue
        _enc_flush_eobrun(state, toks, tab)
        toks.append(("sym", tab, (r << 4) | 1))
        toks.append(("bits", 1 if int(block[k]) >= 0 else 0, 1))
        toks.extend(("bits", b, 1) for b in br)
        br = []
        r = 0
    if r > 0 or br:
        state["eobrun"] += 1
        state["pending"].extend(br)
        if state["eobrun"] == 0x7FFF:
            _enc_flush_eobrun(state, toks, tab)


def encode_jpeg_progressive(
    px: np.ndarray,
    quality: int = 90,
    restart_interval: int = 0,
    subsampling: tuple[int, int] = (1, 1),
    script: list[tuple[tuple[int, ...], int, int, int, int]] | None = None,
    precision: int = 8,
) -> bytes:
    """Same pixel contract as :func:`encode_jpeg`, but emits the
    progressive DCT process (SOF2) using a libjpeg-shaped scan script
    (override via ``script``: a list of ``(component_indices, Ss, Se, Ah,
    Al)``).  Entropy tokens are buffered per scan so each scan ships its
    own constructed fixed-length Huffman tables via a preceding DHT."""
    h, w, ncomp, factors, comp_class, qtabs, comp_blocks, mcux, mcuy = (
        _prepare_blocks(px, quality, subsampling, precision)
    )
    hmax = max(fh for fh, _ in factors)
    vmax = max(fv for _, fv in factors)
    if script is None:
        script = _PROG_SCRIPT_3 if ncomp == 3 else _PROG_SCRIPT_1

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    for tq, table in enumerate(qtabs):
        out += seg(0xDB, _dqt_payload(tq, table))
    comps = b"".join(
        struct.pack(
            "BBB", i + 1, (factors[i][0] << 4) | factors[i][1], comp_class[i]
        )
        for i in range(ncomp)
    )
    out += seg(0xC2, struct.pack(">BHHB", precision, h, w, ncomp) + comps)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    for comp_ids, ss, se, ah, al in script:
        if ss == 0 and len(comp_ids) > 1:  # interleaved DC: MCU walk
            units = [
                [
                    (ci, my * factors[ci][1] + by, mx * factors[ci][0] + bx)
                    for ci in comp_ids
                    for by in range(factors[ci][1])
                    for bx in range(factors[ci][0])
                ]
                for my in range(mcuy)
                for mx in range(mcux)
            ]
        else:  # single component: its true block grid
            ci = comp_ids[0]
            cw = -(-(w * factors[ci][0]) // hmax)
            ch = -(-(h * factors[ci][1]) // vmax)
            units = [
                [(ci, by, bx)]
                for by in range(-(-ch // 8))
                for bx in range(-(-cw // 8))
            ]

        # token pass, split into restart segments
        segments: list[list[tuple]] = [[]]
        preds = dict.fromkeys(comp_ids, 0)
        state = {"eobrun": 0, "pending": []}
        since_rst = 0
        for unit in units:
            if restart_interval and since_rst == restart_interval:
                _enc_flush_eobrun(state, segments[-1], 0)
                segments.append([])
                preds = dict.fromkeys(preds, 0)
                since_rst = 0
            since_rst += 1
            for ci, by, bx in unit:
                block = comp_blocks[ci][(by, bx)]
                tab = comp_class[ci]
                toks = segments[-1]
                if ss == 0:
                    if ah == 0:
                        v = int(block[0]) >> al
                        s, m = _mag_bits(v - preds[ci])
                        preds[ci] = v
                        toks.append(("sym", tab, s))
                        toks.append(("bits", m, s))
                    else:
                        toks.append(("bits", (int(block[0]) >> al) & 1, 1))
                elif ah == 0:
                    _enc_ac_first(block, ss, se, al, 0, state, toks)
                else:
                    _enc_ac_refine(block, ss, se, al, 0, state, toks)
        _enc_flush_eobrun(state, segments[-1], 0)

        # constructed tables for the symbols this scan actually uses
        tclass = 0 if ss == 0 else 1
        syms: dict[int, set[int]] = {}
        for segment in segments:
            for tok in segment:
                if tok[0] == "sym":
                    syms.setdefault(tok[1], set()).add(tok[2])
        tables = {tab: _fixed_length_table(s) for tab, s in syms.items()}
        for tab, (bits, vals, _) in sorted(tables.items()):
            out += seg(0xC4, bytes([(tclass << 4) | tab]) + bytes(bits) + bytes(vals))

        sos = bytes([len(comp_ids)]) + b"".join(
            struct.pack(
                "BB",
                ci + 1,
                (comp_class[ci] << 4) if ss == 0 else 0,
            )
            for ci in comp_ids
        ) + bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        for si, segment in enumerate(segments):
            if si:
                out += bytes([0xFF, 0xD0 + ((si - 1) & 7)])
            writer = _BitWriter()
            for tok in segment:
                if tok[0] == "sym":
                    code, length = tables[tok[1]][2][tok[2]]
                    writer.write(code, length)
                elif tok[2]:
                    writer.write(tok[1], tok[2])
            writer.flush()
            out += bytes(writer.out)
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_is_progressive(blob: bytes) -> bool:
    """Marker-segment walk for the frame kind: True iff the file's SOF is
    SOF2.  A raw byte scan for FF C2 false-positives on marker payloads
    (they are NOT byte-stuffed), so this walks segment lengths like the
    decoder does."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    while pos + 1 < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        while pos + 1 < len(blob) and blob[pos + 1] == 0xFF:
            pos += 1  # B.1.1.2: any number of FF fill bytes may pad a marker
        if pos + 1 >= len(blob):
            break
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker in (0xD9, 0xDA):
            break
        if marker == 0xC2:
            return True
        if marker in (0xC0, 0xC1):
            return False
        (seglen,) = struct.unpack_from(">H", blob, pos)
        pos += seglen
    return False
