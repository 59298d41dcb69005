"""Regenerate mctpu/data/sobol_directions_2048x30.npy.

The direction numbers are the standard Joe-Kuo (new-joe-kuo-6) table as
shipped by torch.quasirandom.SobolEngine (public mathematical data);
extracted once so the runtime has no torch dependency.  2048 dimensions
cover the production grids (252-obs variance-swap years, 500-node CVA
grids, 1000-asset baskets) with headroom; the classic Joe-Kuo benchmark
dimension count is 1111.
"""
import numpy as np
import torch

D = 2048
st = torch.quasirandom.SobolEngine(dimension=D).sobolstate.numpy()
assert st.shape == (D, 30) and (st >= 0).all() and (st < 2**30).all()
np.save("mctpu/data/sobol_directions_2048x30.npy", st.astype(np.uint32))
print("saved", st.shape)
