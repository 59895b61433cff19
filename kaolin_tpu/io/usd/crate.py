"""USD Crate (binary ``.usdc``) reader — dependency-free.

TPU-framework analog of the reference's binary-USD support (the reference
delegates to the pxr ``usd-core`` C++ runtime, ``io/usd/mesh.py``; this repo
is dependency-free by design, so the Crate container is parsed directly).

Implements the documented open format (pxr/usd/usd/crateFile.cpp) for file
versions 0.7.x/0.8.x — the versions current USD writers emit:

* bootstrap + table of contents (TOKENS / STRINGS / FIELDS / FIELDSETS /
  PATHS / SPECS sections)
* ``TfFastCompression`` payloads (chunked LZ4 block format; the LZ4 decode
  runs in the native C++ library with a pure-Python fallback)
* ``Usd_IntegerCompression`` 32/64-bit delta + 2-bit-code streams used by
  the structural sections and compressed integer arrays
* value reps: inlined scalars/vecs, raw scalar/vec/matrix arrays, and
  compressed int/float arrays (both ``'i'`` integer-stored and ``'t'``
  lookup-table encodings)

The public entry point :func:`crate_to_usda` TRANSPILES the crate content
into USDA text covering the geometry payloads this suite consumes (Mesh /
Points / Xform prims, primvars with interpolation metadata, and
``timeSamples`` blocks with layer start/endTimeCode metadata — so Timelapse
checkpoints written by stock binary-USD tooling parse like text ones, ref
``io/usd/mesh.py:356`` ``time=`` params). Unsupported value types are
skipped attribute-wise, never fatally.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["CrateFile", "crate_to_usda", "is_crate"]


def is_crate(head: bytes) -> bool:
    return head.startswith(b"PXR-USDC")


# ---------------------------------------------------------------------------
# compression primitives
# ---------------------------------------------------------------------------

def _lz4_block(data, out_size):
    from kaolin_tpu.native import lz4_decompress_block
    return bytes(lz4_decompress_block(data, out_size))


def _fast_decompress(data: bytes, out_size: int) -> bytes:
    """TfFastCompression buffer: first byte = chunk count (0 → one chunk)."""
    n_chunks = data[0]
    if n_chunks == 0:
        return _lz4_block(data[1:], out_size)
    out = bytearray()
    pos = 1
    for _ in range(n_chunks):
        (sz,) = struct.unpack_from("<i", data, pos)
        pos += 4
        out += _lz4_block(data[pos:pos + sz], out_size - len(out))
        pos += sz
    return bytes(out)


def _decode_ints(buf: bytes, n: int, width: int) -> np.ndarray:
    """Usd_IntegerCompression payload (post-LZ4): common value, packed 2-bit
    codes (LSB-first), then per-code payloads; values are running deltas.

    width 4: codes {0: common, 1: int8, 2: int16, 3: int32}
    width 8: codes {0: common, 1: int16, 2: int32, 3: int64}
    """
    if n == 0:
        return np.zeros(0, np.int64)
    fmt = "<i" if width == 4 else "<q"
    common = struct.unpack_from(fmt, buf, 0)[0]
    ncode_bytes = (n + 3) // 4
    codes = np.frombuffer(buf, np.uint8, ncode_bytes, width)
    codes = ((codes[:, None] >> (2 * np.arange(4)[None])) & 3).reshape(-1)[:n]
    pos = width + ncode_bytes
    sizes = ((1, 2, 4) if width == 4 else (2, 4, 8))
    fmts = (("<b", "<h", "<i") if width == 4 else ("<h", "<i", "<q"))
    deltas = np.empty(n, np.int64)
    for i in range(n):
        c = codes[i]
        if c == 0:
            deltas[i] = common
        else:
            deltas[i] = struct.unpack_from(fmts[c - 1], buf, pos)[0]
            pos += sizes[c - 1]
    return np.cumsum(deltas)


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def seek(self, pos):
        self.pos = int(pos)

    def read(self, fmt):
        out = struct.unpack_from(fmt, self.d, self.pos)
        self.pos += struct.calcsize(fmt)
        return out if len(out) > 1 else out[0]

    def bytes(self, n):
        out = self.d[self.pos:self.pos + n]
        self.pos += n
        return out

    def compressed_ints(self, n, width=4):
        comp_size = self.read("<Q")
        buf = self.bytes(comp_size)
        # generous workspace: header + worst-case payloads
        enc = _fast_decompress(buf, width + (n + 3) // 4 + n * width + 16)
        return _decode_ints(enc, n, width)


# value rep bits
_IS_ARRAY = 1 << 63
_IS_INLINED = 1 << 62
_IS_COMPRESSED = 1 << 61
_PAYLOAD_MASK = (1 << 48) - 1

# crateDataTypes.h enum → (numpy dtype, components)
_SCALAR = {
    1: (np.bool_, 1), 2: (np.uint8, 1), 3: (np.int32, 1), 4: (np.uint32, 1),
    5: (np.int64, 1), 6: (np.uint64, 1), 7: (np.float16, 1),
    8: (np.float32, 1), 9: (np.float64, 1),
    16: (np.float64, 4), 17: (np.float32, 4), 18: (np.float16, 4),  # quats
    19: (np.float64, 2), 20: (np.float32, 2), 21: (np.float16, 2),
    22: (np.int32, 2),
    23: (np.float64, 3), 24: (np.float32, 3), 25: (np.float16, 3),
    26: (np.int32, 3),
    27: (np.float64, 4), 28: (np.float32, 4), 29: (np.float16, 4),
    30: (np.int32, 4),
    13: (np.float64, 4), 14: (np.float64, 9), 15: (np.float64, 16),  # mats
}
_T_STRING, _T_TOKEN, _T_ASSET = 10, 11, 12
_T_TOKEN_VECTOR = 41
_T_SPECIFIER = 42
_T_TIME_SAMPLES = 46
_T_DOUBLE_VECTOR = 48

_SPEC_ATTRIBUTE, _SPEC_PRIM, _SPEC_PSEUDO_ROOT, _SPEC_RELATIONSHIP = 1, 6, 7, 8


class CrateFile:
    """Parsed .usdc: tokens, paths, and per-path field dicts."""

    def __init__(self, path):
        with open(path, "rb") as f:
            self.data = f.read()
        if not is_crate(self.data[:8]):
            raise ValueError(f"{path} is not a USD crate file")
        self.version = tuple(self.data[8:11])
        if self.version[0] != 0 or self.version[1] < 4:
            raise ValueError(
                f"unsupported crate version {self.version} in {path}")
        r = self.r = _Reader(self.data)
        (toc_offset,) = struct.unpack_from("<q", self.data, 16)
        r.seek(toc_offset)
        num_sections = r.read("<q")
        self.sections = {}
        for _ in range(num_sections):
            name = r.bytes(16).split(b"\0")[0].decode()
            start, size = r.read("<qq")
            self.sections[name] = (start, size)
        self._read_tokens()
        self._read_strings()
        self._read_fields()
        self._read_fieldsets()
        self._read_paths()
        self._read_specs()

    # -- sections --
    def _read_tokens(self):
        r = self.r
        r.seek(self.sections["TOKENS"][0])
        n, un_size, comp_size = r.read("<QQQ")
        chars = _fast_decompress(r.bytes(comp_size), un_size)
        self.tokens = chars.split(b"\0")[:n]
        self.tokens = [t.decode("utf-8", "replace") for t in self.tokens]

    def _read_strings(self):
        r = self.r
        r.seek(self.sections["STRINGS"][0])
        n = r.read("<Q")
        idx = np.frombuffer(self.data, "<u4", n, r.pos)
        self.strings = [self.tokens[i] for i in idx]

    def _read_fields(self):
        r = self.r
        r.seek(self.sections["FIELDS"][0])
        n = r.read("<Q")
        token_idx = self.r.compressed_ints(n)
        reps_size = r.read("<Q")
        reps = np.frombuffer(_fast_decompress(r.bytes(reps_size), n * 8),
                             "<u8", n)
        self.fields = [(self.tokens[int(t)], int(v))
                       for t, v in zip(token_idx, reps)]

    def _read_fieldsets(self):
        r = self.r
        r.seek(self.sections["FIELDSETS"][0])
        n = r.read("<Q")
        runs = self.r.compressed_ints(n).astype(np.uint32)
        # runs of field indexes terminated by 0xFFFFFFFF
        self.fieldsets = []
        start = 0
        for i in range(len(runs)):
            if runs[i] == 0xFFFFFFFF:
                self.fieldsets.append(
                    [int(x) for x in runs[start:i]])
                start = i + 1
        # fieldset index in specs refers to the FLAT index of the run start
        self.fieldset_by_start = {}
        start = 0
        for i in range(len(runs)):
            if runs[i] == 0xFFFFFFFF:
                self.fieldset_by_start[start] = \
                    [int(x) for x in runs[start:i]]
                start = i + 1

    def _read_paths(self):
        r = self.r
        r.seek(self.sections["PATHS"][0])
        num_paths = r.read("<Q")
        n = r.read("<Q")  # number of encoded entries (== num_paths)
        path_idx = self.r.compressed_ints(n)
        elem_tok = self.r.compressed_ints(n)
        jumps = self.r.compressed_ints(n)
        self.paths = [None] * num_paths
        stack = [(0, None)]
        while stack:
            cur, parent = stack.pop()
            while True:
                this = cur
                cur += 1
                if parent is None:
                    path = "/"
                else:
                    tok = self.tokens[abs(int(elem_tok[this]))]
                    if elem_tok[this] < 0:      # property path
                        path = (parent if parent != "/" else "") + "." + tok
                    else:
                        path = (parent if parent != "/" else "") + "/" + tok
                self.paths[int(path_idx[this])] = path
                j = int(jumps[this])
                has_child = j > 0 or j == -1
                has_sibling = j >= 0
                if has_child:
                    if has_sibling:
                        stack.append((this + j, parent))
                    parent = path
                    continue
                if has_sibling:
                    continue
                break

    def _read_specs(self):
        r = self.r
        r.seek(self.sections["SPECS"][0])
        n = r.read("<Q")
        path_idx = self.r.compressed_ints(n)
        fset_idx = self.r.compressed_ints(n)
        spec_types = self.r.compressed_ints(n)
        self.specs = []
        for p, fs, st in zip(path_idx, fset_idx, spec_types):
            fields = {}
            for fi in self.fieldset_by_start.get(int(fs), []):
                name, rep = self.fields[fi]
                fields[name] = rep
            self.specs.append((self.paths[int(p)], int(st), fields))

    # -- value materialization --
    def value(self, rep):
        """Materialize a ValueRep → python/numpy value, or None if the type
        is unsupported (callers skip the attribute)."""
        ty = (rep >> 48) & 0xFF
        payload = rep & _PAYLOAD_MASK
        is_array = bool(rep & _IS_ARRAY)
        is_inlined = bool(rep & _IS_INLINED)
        is_compressed = bool(rep & _IS_COMPRESSED)

        if ty == _T_TOKEN and not is_array:
            if is_inlined:
                return self.tokens[payload]
            r = _Reader(self.data)
            r.seek(payload)
            return self.tokens[r.read("<I")]
        if ty == _T_STRING and not is_array:
            return self.strings[payload] if is_inlined else None
        if ty == _T_ASSET and not is_array:
            return self.tokens[payload] if is_inlined else None
        if ty == _T_SPECIFIER:
            return ("def", "over", "class")[payload & 3]
        if ty == _T_TOKEN_VECTOR:
            r = _Reader(self.data)
            r.seek(payload)
            cnt = r.read("<Q")
            idx = np.frombuffer(self.data, "<u4", cnt, r.pos)
            return [self.tokens[i] for i in idx]
        if ty == _T_TOKEN and is_array:
            r = _Reader(self.data)
            r.seek(payload)
            cnt = r.read("<Q")
            idx = np.frombuffer(self.data, "<u4", cnt, r.pos)
            return [self.tokens[i] for i in idx]
        if ty == _T_DOUBLE_VECTOR:
            r = _Reader(self.data)
            r.seek(payload)
            cnt = int(r.read("<Q"))
            return np.frombuffer(self.data, "<f8", cnt, r.pos).copy()
        if ty == _T_TIME_SAMPLES:
            return self.time_samples(rep)
        if ty not in _SCALAR:
            return None
        dt, comps = _SCALAR[ty]

        if not is_array:
            if is_inlined:
                raw = struct.pack("<I", payload & 0xFFFFFFFF)
                if comps == 1:
                    if dt == np.bool_:
                        return bool(payload)
                    if dt in (np.float64,):
                        return float(np.frombuffer(raw, "<f4")[0])
                    if dt in (np.float32,):
                        return float(np.frombuffer(raw, "<f4")[0])
                    if dt == np.float16:
                        return float(np.frombuffer(raw[:2], "<f2")[0])
                    return int(np.frombuffer(raw, "<i4")[0])
                if ty in (13, 14, 15):  # matrices: int8 diagonal
                    dim = {13: 2, 14: 3, 15: 4}[ty]
                    diag = np.frombuffer(raw[:dim], np.int8)
                    return np.diag(diag.astype(np.float64))
                # vecs/quats: per-component int8
                return np.frombuffer(raw[:comps], np.int8).astype(
                    np.float64 if dt == np.float64 else np.float32)
            r = _Reader(self.data)
            r.seek(payload)
            raw = r.bytes(int(np.dtype(dt).itemsize) * comps)
            v = np.frombuffer(raw, dt)
            return v if comps > 1 else v[0]

        # arrays
        r = _Reader(self.data)
        r.seek(payload)
        cnt = int(r.read("<Q"))
        if not is_compressed:
            total = cnt * comps if ty not in (13, 14, 15) else cnt * comps
            v = np.frombuffer(self.data, np.dtype(dt).newbyteorder("<"),
                              total, r.pos)
            return v.reshape(cnt, comps) if comps > 1 else v
        # compressed arrays: scalar int/float types only
        if dt in (np.int32, np.uint32, np.int64, np.uint64) and comps == 1:
            width = 8 if dt in (np.int64, np.uint64) else 4
            return r.compressed_ints(cnt, width).astype(dt)
        if dt in (np.float32, np.float64, np.float16) and comps == 1:
            code = r.bytes(1)
            if code == b"i":
                return r.compressed_ints(cnt, 4).astype(dt)
            if code == b"t":
                lut_n = r.read("<I")
                lut = np.frombuffer(
                    self.data, np.dtype(dt).newbyteorder("<"), lut_n, r.pos)
                r.pos += lut_n * np.dtype(dt).itemsize
                idx = r.compressed_ints(cnt, 4)
                return lut[idx]
            return None
        if comps > 1 and dt in (np.int32,):
            # compressed vec-int arrays are stored component-interleaved
            flat = r.compressed_ints(cnt * comps, 4).astype(dt)
            return flat.reshape(cnt, comps)
        return None

    def time_samples(self, rep):
        """Materialize a TimeSamples ValueRep → ``{time: value}``.

        Layout (reverse-engineered against pxr-written files; pxr
        crateFile.cpp ``_ReadTimeSamples``): at the payload offset, an int64
        jump (relative to its own position) to the times ValueRep — the
        writer places the DEDUPED ``vector<double>`` times blob in between,
        so shared time curves are stored once — then an int64 jump (same
        convention) to ``{int64 n; ValueRep values[n]}``. Sample values
        whose type is unsupported materialize as None and are dropped.
        """
        base = rep & _PAYLOAD_MASK
        r = _Reader(self.data)
        r.seek(base)
        jump = r.read("<q")
        r.seek(base + jump)
        times = self.value(r.read("<Q"))
        if times is None:
            return None
        pos = r.pos
        jump = r.read("<q")
        r.seek(pos + jump)
        n = int(r.read("<q"))
        reps = struct.unpack_from(f"<{n}Q", self.data, r.pos)
        out = {}
        for t, vr in zip(np.asarray(times), reps):
            v = self.value(int(vr))
            if v is not None:
                out[float(t)] = v
        return out


# ---------------------------------------------------------------------------
# crate → usda transpiler
# ---------------------------------------------------------------------------

def _fmt_value(type_name, v):
    """Format a materialized value as USDA attribute text."""
    if isinstance(v, str):
        return f'"{v}"'
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, list):  # token list
        return "[" + ", ".join(f'"{t}"' for t in v) + "]"
    v = np.asarray(v)
    if v.ndim == 0:
        return repr(v.item())
    if v.ndim == 1:
        if v.dtype.kind in "iu":
            return "[" + ", ".join(str(int(x)) for x in v) + "]"
        return "[" + ", ".join(f"{float(x)}" for x in v) + "]"
    if v.ndim == 2:
        rows = ", ".join(
            "(" + ", ".join(f"{float(x)}" for x in row) + ")" for row in v)
        return "[" + rows + "]"
    return None


def crate_to_usda(path) -> str:
    """Transpile a .usdc file into USDA text (geometry subset: every prim
    with its typed attributes whose values this reader materializes)."""
    crate = CrateFile(path)

    prim_specs = {}
    attr_specs = {}
    for spec_path, spec_type, fields in crate.specs:
        if spec_path is None:
            continue
        if spec_type in (_SPEC_PRIM, _SPEC_PSEUDO_ROOT):
            prim_specs[spec_path] = fields
        elif spec_type == _SPEC_ATTRIBUTE:
            attr_specs[spec_path] = fields

    # group attributes by owning prim
    attrs_by_prim = {}
    for apath, fields in attr_specs.items():
        if "." not in apath:
            continue
        prim, name = apath.rsplit(".", 1)
        attrs_by_prim.setdefault(prim, []).append((name, fields))

    children = {}
    for p in prim_specs:
        if p == "/":
            continue
        parent = p.rsplit("/", 1)[0] or "/"
        children.setdefault(parent, []).append(p)

    # layer metadata (time codes drive TimelapseParser frame discovery)
    header = []
    for key in ("defaultPrim", "upAxis"):
        rep = prim_specs.get("/", {}).get(key)
        if rep is not None:
            v = crate.value(rep)
            if isinstance(v, str):
                header.append(f'    {key} = "{v}"')
    for key in ("startTimeCode", "endTimeCode", "timeCodesPerSecond"):
        rep = prim_specs.get("/", {}).get(key)
        if rep is not None:
            v = crate.value(rep)
            if isinstance(v, (int, float)):
                header.append(f"    {key} = {v}")
    lines = ["#usda 1.0", "("] + header + [")"]

    def emit_attr(name, fields, indent):
        tname = None
        if "typeName" in fields:
            tname = crate.value(fields["typeName"])
        if not isinstance(tname, str):
            tname = None
        meta = ""
        interp_rep = fields.get("interpolation")
        if interp_rep is not None:
            interp = crate.value(interp_rep)
            if isinstance(interp, str):
                meta = f' ( interpolation = "{interp}" )'
        tdecl = f"{tname} " if tname else ""

        rep = fields.get("default")
        if rep is not None:
            v = crate.value(rep)
            text = _fmt_value(tname, v) if v is not None else None
            if text is not None:
                lines.append(f"{indent}{tdecl}{name} = {text}{meta}")

        ts_rep = fields.get("timeSamples")
        if ts_rep is not None:
            samples = crate.value(ts_rep)
            if samples:
                entries = []
                for t in sorted(samples):
                    text = _fmt_value(tname, samples[t])
                    if text is not None:
                        entries.append(f"{indent}    {t}: {text},")
                if entries:
                    lines.append(
                        f"{indent}{tdecl}{name}.timeSamples = {{")
                    lines.extend(entries)
                    lines.append(f"{indent}}}{meta}")

    def emit_prim(path, indent):
        fields = prim_specs.get(path, {})
        tname = crate.value(fields["typeName"]) \
            if "typeName" in fields else None
        if not isinstance(tname, str) or not tname:
            tname = "Scope"
        name = path.rsplit("/", 1)[1]
        lines.append(f'{indent}def {tname} "{name}"')
        lines.append(indent + "{")
        for aname, afields in sorted(attrs_by_prim.get(path, [])):
            emit_attr(aname, afields, indent + "    ")
        for child in sorted(children.get(path, [])):
            emit_prim(child, indent + "    ")
        lines.append(indent + "}")

    for root in sorted(children.get("/", [])):
        emit_prim(root, "")
    return "\n".join(lines) + "\n"
