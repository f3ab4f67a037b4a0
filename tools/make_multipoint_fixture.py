"""Generate the committed MULTIPOINT-layout micro-fixture
(tests/data/multipoint_micro.hdf5).

The real MULTIPOINT corpus (reference download_multipoint_data.py) is not
retrievable in this environment, so this few-hundred-KB stand-in pins the
exact byte layout the reference loader reads
(/root/reference/xpoint/datasets/ImagePairDataset.py:184-197):

    <member name>/optical      float32 (H, W) in [0, 1]
    <member name>/thermal      float32 (H, W) in [0, 1]
    <member name>/thermal_raw  uint16  (H, W)   (optional; raw_thermal: true)

plus the reference's fallback branches: one member carries thermal_raw
next to thermal (raw_thermal config selects it), one member has NO thermal
at all (the loader must fall back to thermal = optical.copy()). Member
names are timestamp-style strings, NOT sample_%04d, so nothing may assume
the mini-corpus naming. Images are non-square (96 x 128) to catch H/W
swaps. tests/test_cli_surface.py drives the loader-parity check against
the actual reference loader and the export -> train -> benchmark CLI chain
on this file.

Regenerate (deterministic):  python tools/make_multipoint_fixture.py
"""
import os
import sys

import numpy as np
import h5py

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.make_mini_corpus import optical_image, pseudo_thermal  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "tests", "data", "multipoint_micro.hdf5")
SHAPE = (96, 128)
# timestamp-style member names like the real corpus, deliberately unsorted
MEMBERS = ["1566481721_4806340", "1566481725_1093750", "1566481719_0312500"]


def main():
    rng = np.random.default_rng(7)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with h5py.File(OUT, "w") as f:
        for i, name in enumerate(MEMBERS):
            opt = optical_image(rng, SHAPE)
            th = pseudo_thermal(opt, rng)
            g = f.create_group(name)
            g.create_dataset("optical", data=opt.astype(np.float32))
            if i == 2:
                # optical-only member: loader must use thermal=optical.copy()
                continue
            g.create_dataset("thermal", data=th.astype(np.float32))
            if i == 0:
                g.create_dataset(
                    "thermal_raw",
                    data=(th * 65535.0).astype(np.uint16))
    size = os.path.getsize(OUT)
    print(f"fixture written to {OUT} ({size/1024:.0f} KB, "
          f"{len(MEMBERS)} members @{SHAPE})")


if __name__ == "__main__":
    main()
