#!/usr/bin/env python
"""Extract hard-coded physics data tables from the reference Fortran source.

The reference embeds several published data tables directly in Fortran
parameter statements:
  - Neufeld & Kaufman (1993) / Neufeld+ (1995) molecular cooling tables
    (src/load_Neufeld_cooling_{H2,H2O,CO}.f90)
  - Visser et al. (2009) 12CO photodissociation self-shielding table
    (src/load_Visser_CO_selfshielding.f90)

These are DATA (published tables), not code.  This tool parses the array
initializers generically and writes them as .npz files under
rac2d_tpu/data/ so the framework is standalone at runtime.

Usage: python tools/extract_ref_tables.py [ref_src_dir] [out_dir]
"""

import re
import sys
from pathlib import Path

import numpy as np

# handles 1.5, .5, 13. and D-exponent forms like 13.D0 / 1.4D-11
FLOAT_RE = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eEdD][-+]?\d+)?")


def _parse_floats(s: str) -> list[float]:
    return [float(tok.replace("D", "e").replace("d", "e"))
            for tok in FLOAT_RE.findall(s)]


def extract_arrays(path: Path) -> dict[str, np.ndarray]:
    """Pull every `name = (/.../)` / `name = reshape((/.../),(/dims/))`
    initializer out of a Fortran source file (continuation-line aware)."""
    src = path.read_text()
    # join continuation lines, drop comments
    lines = []
    for raw in src.splitlines():
        code = raw.split("!")[0].rstrip()
        lines.append(code)
    joined = []
    buf = ""
    for code in lines:
        if buf:
            buf += " " + code.strip()
        else:
            buf = code
        if buf.rstrip().endswith("&"):
            buf = buf.rstrip()[:-1]
            continue
        joined.append(buf)
        buf = ""
    if buf:
        joined.append(buf)

    # integer parameters (for reshape dims)
    consts: dict[str, int] = {}
    for ln in joined:
        if "integer" in ln and "parameter" in ln and "::" in ln:
            body = ln.split("::", 1)[1]
            for m in re.finditer(r"(\w+)\s*=\s*(\d+)", body):
                consts[m.group(1)] = int(m.group(2))

    out: dict[str, np.ndarray] = {}
    for ln in joined:
        m = re.search(r"(\w+)\s*=\s*reshape\s*\(\s*\(/(.*)/\)\s*,"
                      r"\s*\(/\s*([^)]*?)\s*/\)\s*\)", ln)
        if m:
            name, data_s, dims_s = m.group(1), m.group(2), m.group(3)
            vals = _parse_floats(data_s)
            dims = []
            for tok in dims_s.split(","):
                tok = tok.strip()
                dims.append(consts[tok] if tok in consts else int(tok))
            # Fortran reshape is column-major; a source longer than the
            # declared shape is legal and truncated (the reference's CO
            # tables list 11 column-density rows but declare 10)
            n = int(np.prod(dims))
            arr = np.array(vals[:n]).reshape(tuple(reversed(dims))).T
            out[name] = arr
            continue
        m = re.search(r"(\w+)\s*=\s*\(/(.*)/\)", ln)
        if m and "reshape" not in ln:
            name, data_s = m.group(1), m.group(2)
            vals = _parse_floats(data_s)
            if vals:
                out[name] = np.array(vals)
    return out


def main():
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference/src")
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2
                   else Path(__file__).parent.parent / "rac2d_tpu" / "data")
    out_dir.mkdir(parents=True, exist_ok=True)

    jobs = {
        "neufeld_h2": "load_Neufeld_cooling_H2.f90",
        "neufeld_h2o": "load_Neufeld_cooling_H2O.f90",
        "neufeld_co": "load_Neufeld_cooling_CO.f90",
        "visser_co_shielding": "load_Visser_CO_selfshielding.f90",
    }
    for out_name, fname in jobs.items():
        arrays = extract_arrays(src / fname)
        # drop commented-out duplicates that survived (keep last definition)
        path = out_dir / f"{out_name}.npz"
        np.savez(path, **arrays)
        print(f"{path.name}: "
              + ", ".join(f"{k}{list(v.shape)}" for k, v in arrays.items()))


if __name__ == "__main__":
    main()
