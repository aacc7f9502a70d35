#!/usr/bin/env python
"""Extract the AprilTag family code tables into a binary .npz artifact.

The code tables are public-domain data constants originating from the
AprilTag project / Kalibr (see kalibr_create_target_pdf); the reference
detector embeds them at src/tag_families.rs:30-658. We parse the hex
constants out of that file once and store them as packed uint64 arrays in
``aprilgrid_tpu/data/tag_families.npz`` so the built package is standalone.

Run from the repo root:  python tools/extract_family_codes.py
"""

import re
import sys
from pathlib import Path

import numpy as np

REFERENCE = Path("/root/reference/src/tag_families.rs")
OUT = Path(__file__).resolve().parent.parent / "aprilgrid_tpu" / "data" / "tag_families.npz"


def main() -> None:
    text = REFERENCE.read_text()
    tables = {}
    for m in re.finditer(
        r"pub const (\w+): \[u64; (\d+)\] = \[(.*?)\];", text, re.S
    ):
        name, n, body = m.group(1), int(m.group(2)), m.group(3)
        vals = [int(v, 16) for v in re.findall(r"0x([0-9A-Fa-f]+)", body)]
        assert len(vals) == n, (name, len(vals), n)
        tables[name.lower()] = np.array(vals, dtype=np.uint64)
    assert set(tables) == {"t16h5", "t25h7", "t25h9", "t36h11"}, tables.keys()
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **tables)
    for k, v in tables.items():
        print(f"{k}: {len(v)} codes, first=0x{int(v[0]):X}")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    sys.exit(main())
