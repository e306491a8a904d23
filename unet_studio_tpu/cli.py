"""Command-line interface — flag-for-flag parity with the reference
(main.cpp:107-125, train.cpp:1072-1181, evaluate.cpp:462-517,
qc.cpp:164-378).

Actions: ``--action=train|evaluate|qc`` plus ``--model``; every
augmentation option id from the options table is an accepted flag.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

from .config.options import OPTION_TABLE, default_option_values
from .utils.assets import find_asset_root, scan_templates


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="unet-studio-tpu",
        description="TPU-native 3D U-Net brain segmentation (train/evaluate/qc)",
    )
    p.add_argument("--action", choices=["train", "evaluate", "qc"], required=True)
    p.add_argument("--model", required=True, help="model .nz path or zoo name")
    p.add_argument("--source", help="evaluate: input file(s)/directory")
    p.add_argument("--bids", help="train/qc: comma-separated BIDS roots")
    p.add_argument("--device", default="", help="accepted for parity; device "
                   "selection is mesh-driven on TPU")
    p.add_argument(
        "--thread_count", type=int, default=min(8, os.cpu_count() or 1),
        help="host worker threads: QC load/resample pool and evaluate "
        "post-processing pool (train.cpp:983, qc.cpp:273; training "
        "augmentation runs on-device, so it has no host aug workers)",
    )
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=0.001)
    p.add_argument("--epoch", type=int, default=10000)
    p.add_argument("--is_label", type=int, default=1)
    p.add_argument("--cost_ce", type=int, default=1)
    p.add_argument("--cost_dice", type=int, default=1)
    p.add_argument("--cost_mse", type=int, default=1)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--in_count", type=int, default=1)
    p.add_argument("--out_count", type=int, default=None)
    p.add_argument("--architecture", default=None)
    p.add_argument("--label_weight", default=None)
    p.add_argument("--file_list", default=None)
    p.add_argument("--template", default=None)
    p.add_argument("--atlas", default=None)
    p.add_argument("--output_type", type=int, default=0)
    p.add_argument("--asset_root", default=None, help="dir containing atlas/ and unet/")
    p.add_argument(
        "--coordinator", default=os.environ.get("UNET_TPU_COORDINATOR"),
        help="multi-host coordinator address host:port (jax.distributed); "
        "each host then loads only its shard of every batch",
    )
    p.add_argument("--session", default=None, help="load a training session JSON")
    p.add_argument("--save_session", default=None, help="write the training session JSON")
    p.add_argument("--mosaic", default=None, help="evaluate: also export a PNG slice mosaic")
    p.add_argument("--data_parallel", type=int, default=None,
                   help="number of devices on the data mesh axis (default: all)")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    for item in OPTION_TABLE:
        p.add_argument(f"--{item.id}", type=float, default=None, help=item.hint)
    return p


def get_files(source: str) -> list[str]:
    if os.path.isdir(source):
        return sorted(glob.glob(os.path.join(source, "*.nii.gz")) +
                      glob.glob(os.path.join(source, "*.nii")))
    if any(ch in source for ch in "*?["):
        return sorted(glob.glob(source))
    return [s for s in source.split(",") if s]


def resolve_model_path(args) -> str:
    from .models.serialize import get_model_path

    root = find_asset_root(args.asset_root)
    zoo = os.path.join(root, "unet") if root else None
    return get_model_path(args.model, zoo)


def cmd_train(args) -> int:
    import jax

    from .data.bids import get_bids_pairs
    from .engine.train import TrainEngine, TrainParam
    from .models.dsl import default_architecture
    from .models.serialize import load_model, save_model
    from .models.unet3d import UNet3d, round_up_size
    from .io.nifti import read_nifti
    from .ops.augment import AugOptions
    from .parallel.mesh import make_mesh

    if args.session:
        from .config.session import load_session

        sess = load_session(args.session)
        args.bids = args.bids or None
        images, labels = sess["images"], sess["labels"]
        args.model = sess.get("model_path", args.model)
        args.batch_size = sess.get("batch_size", args.batch_size)
        args.learning_rate = sess.get("learning_rate", args.learning_rate)
        args.epoch = sess.get("epoch", args.epoch)
        args.seed = sess.get("seed", args.seed)
        for k, v in sess.get("options", {}).items():
            if getattr(args, k, None) is None:
                setattr(args, k, v)
    elif not args.bids:
        print("error: please specify --bids", file=sys.stderr)
        return 1
    else:
        images, labels = get_bids_pairs(args.bids)
    print(f"{len(images)} matched pairs")

    if args.file_list:
        with open(args.file_list, "w") as f:
            for i, l in zip(images, labels):
                f.write(f"{os.path.basename(i)}=>{os.path.basename(l)}\n")

    model_path = resolve_model_path(args)
    if os.path.exists(model_path):
        print(f"loading existing model {model_path}")
        try:
            model = load_model(model_path)
        except Exception as exc:  # noqa: BLE001  (train.cpp:1110-1111)
            print(f"error: failed to load model from {model_path}: {exc}",
                  file=sys.stderr)
            return 1
    else:
        try:
            lbl = read_nifti(labels[0])
            img = read_nifti(images[0])
        except Exception as exc:  # noqa: BLE001  (train.cpp:1119-1122)
            print(f"error: cannot load label/image file: {exc}", file=sys.stderr)
            return 1
        out_count = args.out_count or int(np.max(lbl.data)) + 1
        architecture = args.architecture or default_architecture(out_count)
        model = UNet3d.create(args.in_count, out_count, architecture, seed=0)
        model.dim = round_up_size(img.shape_xyz, 32)
        model.voxel_size = np.asarray(img.voxel_size, np.float32)
        print(f"dim: {model.dim}")
        print(f"vs: {tuple(float(v) for v in model.voxel_size)}")

    opts = default_option_values()
    for item in OPTION_TABLE:
        v = getattr(args, item.id, None)
        if v is not None:
            opts[item.id] = v

    seed = args.seed
    if seed is None:
        seed = len(model.testing_errors) // 3 // args.epoch  # train.cpp:1148

    param = TrainParam(
        image_file_name=images,
        label_file_name=labels,
        batch_size=args.batch_size,
        epoch=args.epoch,
        learning_rate=args.learning_rate,
        seed=seed,
        is_label=bool(args.is_label),
        cost_ce=bool(args.cost_ce),
        cost_dice=bool(args.cost_dice),
        cost_mse=bool(args.cost_mse),
        options=AugOptions.from_dict(opts),
        compute_dtype=args.compute_dtype,
    )
    n_dev = args.data_parallel or len(jax.devices())
    n_dev = min(n_dev, args.batch_size)
    while args.batch_size % n_dev:
        n_dev -= 1
    mesh = make_mesh(n_data=n_dev)
    print(f"device mesh: {n_dev} x data ({jax.devices()[0].platform})")

    if args.save_session:
        from .config.session import save_session

        save_session(
            args.save_session,
            images=images,
            labels=labels,
            model_path=model_path,
            batch_size=param.batch_size,
            learning_rate=param.learning_rate,
            epoch=param.epoch,
            is_label=param.is_label,
            seed=param.seed,
            options=opts,
        )

    engine = TrainEngine(model, param, mesh=mesh, model_path=model_path)
    engine.start()
    if engine.error_msg:
        print(f"error: {engine.error_msg}", file=sys.stderr)
        return 1
    print(f"starting epoch: {engine.cur_epoch}")
    engine.run()
    if engine.error_msg:
        print(f"error: {engine.error_msg}", file=sys.stderr)
        return 1
    engine.sync_params_to_model()
    final = model_path + ".final.nz"
    print(f"save model to {final}")
    save_model(final, model)
    return 0


def cmd_evaluate(args) -> int:
    import jax.numpy as jnp

    from .engine.atlas import AtlasParcellation
    from .engine.evaluate import EvaluateEngine
    from .models.serialize import load_model

    if not args.source:
        print("error: please specify --source", file=sys.stderr)
        return 1
    files = get_files(args.source)
    if not files:
        print(f"error: no file specified at --source", file=sys.stderr)
        return 1
    model_path = resolve_model_path(args)
    if not os.path.exists(model_path):
        print(f"error: cannot find the network file {model_path}", file=sys.stderr)
        return 1
    print(f"loading network {model_path}")
    model = load_model(model_path)
    print(model.get_info())

    if args.template is not None and args.atlas is not None:
        root = find_asset_root(args.asset_root)
        seg_list, atlas_lists = scan_templates(root)
        parc = AtlasParcellation()
        tmpl = args.template
        if tmpl.isdigit() and seg_list:
            idx = int(tmpl)
            tmpl = seg_list[idx]
            atlas = args.atlas if os.path.exists(args.atlas) else (
                atlas_lists[idx][0] if atlas_lists[idx] else args.atlas
            )
        else:
            atlas = args.atlas
        if not parc.load_template(tmpl) or not parc.load_atlas(atlas):
            print(f"error: {parc.error_msg}", file=sys.stderr)
            return 1
        print(f"atlas loaded: {parc.atlas_region_count} regions")

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    engine = EvaluateEngine(
        model, compute_dtype=dtype, post_workers=min(4, args.thread_count)
    )
    for case in engine.run(files):
        if case.error_msg:
            print(f"error: {case.error_msg}", file=sys.stderr)
            return 1
        out = case.path + ".result.nii.gz"
        print(f"save to {out}")
        if not engine.save_case(case, out, args.output_type):
            print(f"error: cannot save {out}", file=sys.stderr)
            return 1
        if args.mosaic:
            from .io.nifti import canonicalize_lps, read_nifti
            from .utils.mosaic import save_mosaic_png

            vol = canonicalize_lps(read_nifti(case.path)).data.astype(float)
            if vol.ndim == 4:
                vol = vol[0]
            save_mosaic_png(args.mosaic, vol, case.label)
            print(f"mosaic saved to {args.mosaic}")
    return 0


def cmd_qc(args) -> int:
    import jax.numpy as jnp

    from .data.bids import get_bids_pairs
    from .engine.qc import run_qc
    from .models.serialize import load_model

    if not args.bids:
        print("error: please specify --bids", file=sys.stderr)
        return 1
    images, labels = get_bids_pairs(args.bids)
    model_path = resolve_model_path(args)
    if not os.path.exists(model_path):
        print(f"error: cannot find model {model_path}", file=sys.stderr)
        return 1
    model = load_model(model_path)
    stem = os.path.basename(model_path)
    for suffix in (".nz",):
        if stem.endswith(suffix):
            stem = stem[: -len(suffix)]
    report = os.path.join(os.path.dirname(model_path) or ".", stem + ".error_report.tsv")
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    run_qc(
        model, images, labels, report, compute_dtype=dtype,
        n_workers=args.thread_count,
    )
    print(f"QC report saved to {report}")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.coordinator:
        from .utils.device import init_multihost

        init_multihost(args.coordinator)
    # boot-time accelerator probe + self-test (check_cuda analog, main.cpp:93-102)
    from .utils.device import check_tpu

    err = check_tpu()
    if err:
        print(f"warning: {err}", file=sys.stderr)
    if args.action == "train":
        return cmd_train(args)
    if args.action == "evaluate":
        return cmd_evaluate(args)
    if args.action == "qc":
        return cmd_qc(args)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
