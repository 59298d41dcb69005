"""Regenerate mctpu/data/sobol_directions_128x30.npy.

The direction numbers are the standard Joe-Kuo (D6) table as shipped by
torch.quasirandom.SobolEngine (public mathematical data); extracted once so
the runtime has no torch dependency.
"""
import numpy as np
import torch

D = 128
st = torch.quasirandom.SobolEngine(dimension=D).sobolstate.numpy()
assert st.shape == (D, 30) and (st >= 0).all() and (st < 2**30).all()
np.save("mctpu/data/sobol_directions_128x30.npy", st.astype(np.uint32))
print("saved", st.shape)
