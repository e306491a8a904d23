"""Independent `.nz` codec cross-check (VERDICT round-1, item 3 fallback).

The package codec (io/nz.py) is a documented reconstruction of TIPL's
gz_mat_read/gz_mat_write MAT-v4 container (the reference never vendored
TIPL).  This module implements a SECOND, fully independent decoder and
encoder straight from the MAT Level-4 specification + the mask-slope
convention of main.cpp:223-229, sharing no code with io/nz.py, and
cross-checks both directions:

* package writer -> independent reader: every record parses, metadata
  strings match, sloped tensors dequantize to within one quantization
  step of the original parameters;
* independent writer -> package reader: a file produced by this module's
  encoder loads through the package's model loader with identical
  metadata and tensors.
"""

import gzip
import struct

import numpy as np

from unet_studio_tpu.models.dsl import default_architecture
from unet_studio_tpu.models.serialize import load_model, save_model
from unet_studio_tpu.models.unet3d import UNet3d, param_order


_DTYPES = {0: np.float64, 10: np.float32, 20: np.int32, 30: np.int16,
           40: np.uint16, 50: np.uint8}


def independent_parse(path):
    """Minimal MAT-v4 stream parser: list of (name, rows, cols, array)."""
    out = []
    with gzip.open(path, "rb") as f:
        while True:
            hdr = f.read(20)
            if len(hdr) < 20:
                break
            type_code, rows, cols, imagf, namelen = struct.unpack("<5i", hdr)
            assert imagf == 0
            name = f.read(namelen).split(b"\0")[0].decode()
            dt = np.dtype(_DTYPES[type_code])
            data = np.frombuffer(
                f.read(rows * cols * dt.itemsize), dt
            ).copy()
            out.append((name, rows, cols, data))
    return out


def independent_write(path, records):
    """records: list of (name, rows, cols, np array)."""
    inv = {np.dtype(v): k for k, v in _DTYPES.items()}
    with gzip.open(path, "wb") as f:
        for name, rows, cols, arr in records:
            nb = name.encode() + b"\0"
            f.write(struct.pack(
                "<5i", inv[np.dtype(arr.dtype)], rows, cols, 0, len(nb)
            ))
            f.write(nb)
            f.write(np.ascontiguousarray(arr.reshape(-1)).tobytes())


def _dequant(q, slope_pair):
    slope, inter = np.asarray(slope_pair, np.float64)[:2]
    return np.where(q == 0, 0.0, (q.astype(np.float64) - 1.0) * slope + inter)


def test_package_writer_vs_independent_reader(tmp_path):
    model = UNet3d.create(1, 3, default_architecture(3), seed=0)
    model.training_errors = [0.5, 0.25, 0.125]
    path = str(tmp_path / "m.nz")
    save_model(path, model, sloped=True)

    recs = independent_parse(path)
    byname = {n: (r, c, d) for n, r, c, d in recs}

    # metadata strings
    def txt(key):
        return bytes(byname[key][2].astype(np.uint8)).split(b"\0")[0].decode()

    assert txt("architecture") == model.architecture
    assert list(byname["channels"][2]) == [1, 3]
    assert list(byname["dimension"][2]) == list(model.dim)
    np.testing.assert_allclose(
        byname["training_errors"][2], [0.5, 0.25, 0.125]
    )

    # tensors in registration order; sloped ones dequantize within one step
    entries = param_order(model.spec)
    assert f"tensor{len(entries)-1}" in byname
    for i, (pkey, layer, which) in enumerate(entries):
        name = f"tensor{i}"
        rows, cols, data = byname[name]
        want = np.asarray(model.params[pkey], np.float32).reshape(-1)
        from unet_studio_tpu.models.unet3d import jax_to_torch

        want_t = jax_to_torch(layer, which, np.asarray(model.params[pkey]))
        want_flat = want_t.reshape(-1)
        if data.dtype == np.uint8:  # sloped record
            slope_pair = byname[name + ".slope"][2]
            got = _dequant(data, slope_pair)
            step = float(np.asarray(slope_pair, np.float64)[0])
            assert np.abs(got - want_flat).max() <= step * 0.51 + 1e-9, name
        else:
            np.testing.assert_allclose(data, want_flat, atol=1e-6, err_msg=name)


def test_independent_writer_vs_package_reader(tmp_path):
    """Encode a model with this module's writer, load it with the package
    loader: metadata + parameters must round-trip exactly (unsloped)."""
    from unet_studio_tpu.models.unet3d import jax_to_torch

    model = UNet3d.create(1, 3, default_architecture(3), seed=1)
    model.testing_errors = [0.75, 0.5, 0.25]

    def srec(name, s):
        b = np.frombuffer(s.encode() + b"\0", np.uint8).copy()
        return (name, 1, len(b), b)

    recs = [
        ("channels", 1, 2, np.array([1, 3], np.int32)),
        srec("architecture", model.architecture),
        ("dimension", 1, 3, np.array(model.dim, np.int32)),
        ("voxel_size", 1, 3, np.asarray(model.voxel_size, np.float32)),
        srec("fov_strategy", ""),
        srec("preproc", ""),
        srec("orientation", ""),
        srec("postproc", model.postproc),
        ("single_component_label", 1, 1, np.array([0], np.int32)),
        ("testing_errors", 1, 3, np.array([0.75, 0.5, 0.25], np.float32)),
        ("training_errors", 1, 0, np.zeros(0, np.float32)),
    ]
    for i, (pkey, layer, which) in enumerate(param_order(model.spec)):
        t = jax_to_torch(layer, which, np.asarray(model.params[pkey]))
        flat = t.reshape(-1).astype(np.float32)
        recs.append((f"tensor{i}", 1, flat.size, flat))

    path = str(tmp_path / "ind.nz")
    independent_write(path, recs)
    loaded = load_model(path)
    assert loaded.architecture == model.architecture
    assert loaded.in_count == 1 and loaded.out_count == 3
    assert loaded.testing_errors == [0.75, 0.5, 0.25]
    for k in model.params:
        np.testing.assert_allclose(
            np.asarray(loaded.params[k]),
            np.asarray(model.params[k]),
            atol=1e-6,
            err_msg=k,
        )


def test_package_writer_vs_scipy_matv4_reader(tmp_path):
    """THIRD-party oracle: scipy.io.loadmat's MAT-v4 codec (MATLAB-
    compatible, independently maintained) must parse every record of a
    package-written .nz.  This is the strongest zoo-compatibility proxy
    available offline: TIPL's gz_mat_read is a MAT-v4 reader, so a file
    scipy accepts as MAT-v4 is one the reference accepts (main.cpp:157-233).
    """
    import gzip
    import io as _io

    import scipy.io

    model = UNet3d.create(1, 3, default_architecture(3), seed=0)
    path = str(tmp_path / "m.nz")
    save_model(path, model, sloped=True)

    with gzip.open(path, "rb") as f:
        raw = f.read()
    mat = scipy.io.loadmat(_io.BytesIO(raw))
    names = set(mat.keys())
    order = param_order(model.spec)
    for i, _ in enumerate(order):
        assert f"tensor{i}" in names, f"tensor{i} missing"
    for meta in ("channels", "architecture", "dimension", "voxel_size"):
        assert meta in names, meta
    arch = "".join(
        chr(int(c)) for c in np.asarray(mat["architecture"]).ravel()
    ).rstrip("\x00")
    assert arch == model.architecture

    # scipy's view of each record dequantizes (mask+slope: 0 stays 0,
    # q -> (q-1)*slope + inter, main.cpp:223-229 convention) to exactly
    # the package loader's values
    from unet_studio_tpu.models.unet3d import jax_to_torch

    loaded = load_model(path)
    for i, (key, layer, which) in enumerate(order):
        rec = np.asarray(mat[f"tensor{i}"])
        # record layout is the torch parameters() flattening; scipy
        # reshapes the column-major MAT stream, so 'F'-ravel restores it
        got = jax_to_torch(
            layer, which, np.asarray(loaded.params[key])
        ).reshape(-1)
        vals = rec.astype(np.float64).ravel(order="F")
        if f"tensor{i}.slope" in names:
            slope, inter = np.asarray(
                mat[f"tensor{i}.slope"], np.float64
            ).ravel()[:2]
            vals = np.where(vals == 0, 0.0, (vals - 1.0) * slope + inter)
        assert vals.size == got.size, key
        np.testing.assert_allclose(
            vals.astype(np.float32), got, rtol=0, atol=0, err_msg=key
        )
