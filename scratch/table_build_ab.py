"""On-chip A/B of supercell table-build formulations (round-5 warp item):
v0 current 3-stage stacking; v1 all-parity presplit + one 216-stack of
contiguous views; also transposed-gather experiment."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
from unet_studio_tpu.ops import resample as rs

D, H, W = 192, 224, 192
L, S = 6, 2
rng = np.random.default_rng(0)
vol = jnp.asarray(rng.random((D, H, W)).astype(np.float32))

def timeloop(fn, *args, iters=10, perturb=0):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            aa = list(a)
            aa[perturb] = aa[perturb] + (acc * 1e-30).astype(aa[perturb].dtype)
            o = fn(*aa)
            first = jax.tree.leaves(o)[0]
            return acc + jnp.asarray(first, jnp.float32).ravel()[0]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    _ = float(loop(*args))
    t0 = time.perf_counter()
    _ = float(loop(*args))
    return (time.perf_counter() - t0) / iters * 1e3

def v0(v):
    return rs._supercell_table(v)[0]

def v1(v):
    d, h, w = v.shape
    az, ay, ax = d // 2, h // 2, w // 2
    p = L - S
    vp = jnp.pad(v, ((0, p), (0, p), (0, p)), mode="edge")
    # presplit all three parities: 8 contiguous arrays
    par = [[[vp[pz::2, py::2, px::2] for px in range(2)] for py in range(2)] for pz in range(2)]
    views = []
    for iz in range(L):
        for iy in range(L):
            for ix in range(L):
                a = par[iz % 2][iy % 2][ix % 2]
                views.append(
                    jax.lax.slice(a, (iz // 2, iy // 2, ix // 2),
                                  (iz // 2 + az, iy // 2 + ay, ix // 2 + ax))
                )
    t = jnp.stack(views, axis=-1)
    return t.reshape(az * ay * ax, L ** 3)

t0ref = np.asarray(v0(vol))
t1 = np.asarray(v1(vol))
print("v1 exact:", np.array_equal(t0ref, t1), flush=True)
print(f"v0 (current): {timeloop(v0, vol):8.2f} ms", flush=True)
print(f"v1 (presplit+stack): {timeloop(v1, vol):8.2f} ms", flush=True)

# transposed-output gather experiment
table = v0(vol)
idx = jnp.asarray(rng.integers(0, table.shape[0], 96*112*96).astype(np.int32))
def g_std(tb, i):
    return tb[i]
def g_t(tb, i):
    import jax.lax as lax
    dn = lax.GatherDimensionNumbers(offset_dims=(0,), collapsed_slice_dims=(),
                                    start_index_map=(0,))
    out = lax.gather(tb, i[:, None], dn, slice_sizes=(1, 216))
    return out  # expected (216, N)?
try:
    o = g_t(table, idx)
    print("g_t shape:", o.shape, flush=True)
    ok = bool(jnp.all(o[:, :64] == table[idx[:64]].T)) if o.shape[0] == 216 else False
    print("g_t matches transpose:", ok, flush=True)
    print(f"gather std : {timeloop(g_std, table, idx, perturb=0):8.2f} ms", flush=True)
    print(f"gather tr  : {timeloop(g_t, table, idx, perturb=0):8.2f} ms", flush=True)
except Exception as e:
    print("g_t failed:", e, flush=True)
