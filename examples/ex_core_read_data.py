"""Whitespace-table numeric reader (mirrors
russell_lab/examples/base_read_data.rs / base_read_table.rs)."""
import _prelude  # noqa: F401
import os
import tempfile
import numpy as np
from russell_tpu.core import read_data, read_table

txt = """# comment line
1.0  2.0   3.0
4.0  5.0   6.0
7.0  8.0   9.0
"""
with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as fh:
    fh.write(txt)
    path = fh.name
data = read_data(path)
assert data.shape == (3, 3) and data[1, 2] == 6.0
with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as fh:
    fh.write("x y z\n" + "\n".join("%g %g %g" % tuple(r) for r in data))
    tpath = fh.name
table = read_table(tpath)
assert list(table.keys()) == ["x", "y", "z"]
assert np.allclose(table["y"], [2.0, 5.0, 8.0])
os.unlink(path); os.unlink(tpath)
print("rows:", data.shape[0], "cols:", data.shape[1])
print("read_data / read_table OK")
