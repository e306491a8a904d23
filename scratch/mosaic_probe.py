"""Probe which vector-shuffle forms Mosaic accepts on this toolchain —
each probe is a tiny pallas kernel; prints ok/FAIL per form."""
import sys, traceback
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

print("backend:", jax.default_backend(), flush=True)


def probe(name, body, in_shape, out_shape, dtype=jnp.float32):
    def kern(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])
    x = jnp.asarray(np.random.default_rng(0).random(in_shape), dtype)
    try:
        y = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
        )(x)
        y.block_until_ready() if hasattr(y, "block_until_ready") else None
        _ = np.asarray(y)
        print(f"ok    {name}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:100]
        print(f"FAIL  {name}: {msg}", flush=True)
        return False


S, W = 16, 192
# 1. strided lane slice
probe("lane stride-2 slice (16,192)->(16,96)", lambda x: x[:, 0::2], (S, W), (S, W // 2))
# 2. leading transpose, lanes intact
probe("leading swap (2,8,192)->(8,2,192)", lambda x: jnp.transpose(x, (1, 0, 2)), (2, 8, W), (8, 2, W))
# 3. sublane split
probe("sublane split (16,192)->(2,8,192)", lambda x: x.reshape(2, 8, W), (S, W), (2, 8, W))
# 4. sublane merge
probe("sublane merge (2,8,192)->(16,192)", lambda x: x.reshape(16, W), (2, 8, W), (S, W))
# 5. 2D transpose with small lanes
probe("2D T (768,8)->(8,768)", lambda x: x.T, (768, 8), (8, 768))
probe("2D T (8,768)->(768,8)", lambda x: x.T, (8, 768), (768, 8))
# 6. interleave via stack+reshape
def inter(x):
    a, b = x[:, :96], x[:, 96:]
    return jnp.stack([a, b], axis=-1).reshape(S, W)
probe("lane interleave stack+reshape", inter, (S, W), (S, W))
# 7. roll on lanes
probe("pltpu.roll lanes", lambda x: pltpu.roll(x, 5, 1), (S, W), (S, W))
# 8. deinterleave via reshape (the known-failing form)
probe("lane split reshape (16,192)->(16,96,2)", lambda x: x.reshape(S, 96, 2), (S, W), (S, 96, 2))
# 9. last-two swap on 3D
probe("swap last two (4,8,192)->(4,192,8)", lambda x: jnp.transpose(x, (0, 2, 1)), (4, 8, W), (4, W, 8))
# 10. broadcast middle dim
probe("bcast (8,96)->(2,8,2,96) merge (32,96)",
      lambda x: jnp.broadcast_to(x[None, :, None, :], (2, 8, 2, 96)).reshape(32, 96),
      (8, 96), (32, 96))
# 11. gather-like: take along lanes with iota (dynamic lane shuffle)
def lane_gather(x):
    idx = jax.lax.broadcasted_iota(jnp.int32, (S, W), 1)
    src = (idx // 2).astype(jnp.int32)
    return jnp.take_along_axis(x, src, axis=1)
probe("take_along_axis lanes", lane_gather, (S, W), (S, W))
