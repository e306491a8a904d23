"""Training engine (reference: train_unet, train.hpp:64-113, train.cpp:259-1010).

TPU-first redesign: the reference's 4-stage threaded pipeline (reader ->
augmentation workers -> per-GPU trainer threads -> validator) collapses
into ONE jitted SPMD train step over a device mesh:

    per epoch:  step(params, opt_state, batch, keys, lr)
       inside:  [on device, per item, via lax.scan]  contrast simulation
                -> visual-perception augmentation -> forward ->
                deep-supervision loss -> grad accumulation
                then psum over the ``data`` mesh axis, /batch, clip 12,
                SGD-nesterov step  (train.cpp:604-766 semantics)

Host code only resolves file names, keeps the (tiny) template cache
resident, and logs.  Work-stealing, slot flags, replica weight broadcasts
and gradient merges all disappear — XLA's collectives over ICI replace
them (SURVEY.md §2.10).

Determinism/resume contract: sample ``seed_id = epoch*batch_size + slot``;
the augmentation key is ``fold_in(key(seed), seed_id)`` and the data-pick
RNG is ``np.random.default_rng(seed)`` advanced per seed_id — restarting
from a checkpoint replays the identical sample stream (train.cpp:394-399,
1005).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.bids import TrainingDataset, load_pair_on_model_grid, shift_subject_label
from ..models.serialize import save_model
from ..models.unet3d import PackedHead, UNet3d, forward, packed_head_planes
from ..ops.augment import AugOptions, visual_perception_augmentation
from ..ops.losses import ChannelLeading, calc_losses, deep_supervision_loss
from ..ops.simulate import simulate_modality_subject, simulate_modality_template
from ..parallel.mesh import make_mesh
from .optimizer import SGDConfig, init_opt_state, poly_lr, sgd_step


@dataclass
class TrainParam:
    """Mirrors training_param (train.hpp:8-30)."""

    image_file_name: list[str] = field(default_factory=list)
    label_file_name: list[str] = field(default_factory=list)
    batch_size: int = 32
    epoch: int = 10000
    learning_rate: float = 1e-3
    seed: int = 0
    is_label: bool = True
    cost_ce: bool = True
    cost_dice: bool = True
    cost_mse: bool = True
    options: AugOptions = field(default_factory=AugOptions)
    compute_dtype: str = "bfloat16"  # bf16 compute, fp32 master weights
    # rematerialization trades ~13% step time (measured 399 -> 349 ms/item
    # at the flagship grid) for activation memory; items are scanned
    # sequentially per device, so the flagship live set fits HBM without it
    remat: bool = False


def build_train_step(
    model: UNet3d,
    param: TrainParam,
    mesh: Mesh,
    *,
    has_subjects: bool = False,
    any_shift: bool = False,
    collapse_k: int = 1,
):
    """Build the jitted SPMD (train_step, valid_step) pair.

    train_step(params, opt_state, images (B,D,H,W,C), labels (B,D,H,W),
    is_template (B,), need_shift (B,), keys (B,), lr) -> (params, opt_state,
    metrics[ce_sum, dice_sum, mse_sum, count]) with the batch axis sharded
    over the mesh's ``data`` axis and gradients psum-reduced over ICI.
    """
    spec = model.spec
    n_classes = model.out_count
    options = param.options
    is_label = param.is_label
    cost = (param.cost_ce, param.cost_dice, param.cost_mse)
    cdt = jnp.bfloat16 if param.compute_dtype == "bfloat16" else jnp.float32
    remat = param.remat
    batch_size = param.batch_size
    sgd_cfg = SGDConfig()

    def item_loss(params, img, lab, is_template, need_shift, key):
        """img (D,H,W,C) float, lab (D,H,W) float."""
        k_sim, k_aug = jax.random.split(key)
        if is_label:
            if has_subjects:
                # lax.cond (not where) so mixed batches run ONE simulation
                # per item, not both
                x = jax.lax.cond(
                    is_template,
                    lambda: simulate_modality_template(
                        img[..., 0], lab, n_classes, k_sim
                    ),
                    lambda: simulate_modality_subject(img[..., 0], k_sim),
                )
            else:
                x = simulate_modality_template(img[..., 0], lab, n_classes, k_sim)
        else:
            x = simulate_modality_subject(img[..., 0], k_sim)
        aug_img, aug_lab = visual_perception_augmentation(
            x[..., None], lab, k_aug, options, is_label
        )
        # augmentation has no parameter dependency: cut it out of the
        # autodiff graph so no residuals are kept for backward
        aug_img = jax.lax.stop_gradient(aug_img)
        aug_lab = jax.lax.stop_gradient(aug_lab)
        outs, _ = forward(
            spec, params, aug_img[None], train=True, compute_dtype=cdt,
            remat=remat, level0_packed=True,
        )
        if isinstance(outs[0], PackedHead):
            # straight to the loss's channel-leading planes — never
            # materialize the lane-padded C-minor (...,C) logits tensor
            # (~20 ms/item fwd+bwd at the flagship grid)
            outs = [ChannelLeading(packed_head_planes(outs[0]))] + outs[1:]
        target = aug_lab[None].astype(jnp.int32)
        ds_loss = (
            jax.checkpoint(deep_supervision_loss, static_argnums=(2, 3, 4, 5, 6))
            if remat
            else deep_supervision_loss
        )
        def _packed(collapse):
            loss, lvl0 = ds_loss(outs, target, n_classes, collapse, *cost)
            return loss, jnp.stack(lvl0)

        if any_shift:
            # lax.cond so each item evaluates ONE of the collapsed/plain
            # 5-level loss pyramids (the where form ran both)
            loss, lvl0 = jax.lax.cond(
                need_shift,
                lambda: _packed(collapse_k),
                lambda: _packed(0),
            )
        else:
            loss, lvl0 = _packed(0)
        return loss, lvl0

    grad_fn = jax.grad(item_loss, has_aux=True)

    def device_step(params, opt_state, images, labels, is_template, need_shift, keys, lr):
        """Per device shard: scan over local items accumulating grads, then
        psum over the data axis (the reference's add_gradient_from + div +
        clip + step, train.cpp:756-766)."""
        # the grad/metric accumulators vary per device shard: mark them as
        # varying over the data axis for shard_map's vma tracking.  The
        # params themselves are also pcast to varying for the per-item
        # grad: each shard's gradient legitimately differs (custom-VJP
        # cotangent vma must match the primal input's), and the psum below
        # restores axis-invariance before the optimizer step.
        params_v = jax.tree.map(
            lambda p: jax.lax.pcast(p, "data", to="varying"), params
        )
        zero_grads = jax.tree.map(
            lambda p: jax.lax.pcast(jnp.zeros_like(p), "data", to="varying"),
            params,
        )
        # ce,dice,mse + count
        zero_metrics = jax.lax.pcast(jnp.zeros(4), "data", to="varying")

        def body(carry, item):
            grads_acc, metrics = carry
            img, lab, tmpl, shift, key = item
            g, lvl0 = grad_fn(params_v, img, lab, tmpl, shift, key)
            grads_acc = jax.tree.map(jnp.add, grads_acc, g)
            # training errors: recorded for all items when no subject data
            # exists, else only for subject items (train.cpp:676-682)
            record = (
                (~tmpl).astype(jnp.float32) if has_subjects else jnp.float32(1.0)
            )
            metrics = metrics + jnp.concatenate(
                [lvl0 * record, jnp.reshape(record, (1,))]
            )
            return (grads_acc, metrics), None

        (grads, metrics), _ = jax.lax.scan(
            body,
            (zero_grads, zero_metrics),
            (images, labels, is_template, need_shift, keys),
        )
        grads = jax.lax.psum(grads, "data")
        metrics = jax.lax.psum(metrics, "data")
        grads = jax.tree.map(lambda g: g / batch_size, grads)
        new_params, new_opt = sgd_step(params, grads, opt_state, lr, sgd_cfg)
        return new_params, new_opt, metrics

    from jax import shard_map

    from ..models.unet3d import packed_route_active
    from ..ops.resample import warp_kernel_active

    sharded = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(
            P(), P(), P("data"), P("data"), P("data"), P("data"), P("data"), P(),
        ),
        out_specs=(P(), P(), P()),
        # pallas_call outputs carry no vma annotation, so the machine check
        # must be waived when ANY pallas kernel may trace (packed convs OR
        # the augmentation warp tail — e.g. bench's conv-fallback route on
        # TPU still warps through the kernel); the pure-XLA route keeps it
        # ON (one configuration stays machine-verified)
        check_vma=not (packed_route_active() or warp_kernel_active()),
    )
    # NOTE: no donate_argnums — buffer donation triggers per-call
    # recompilation on the remote-compile (axon) backend (measured 60x
    # slower steps); the extra params+momentum copy is ~270 MB.
    step_fn = jax.jit(sharded)

    def valid_fn(params, img, lab):
        outs, _ = forward(spec, params, img, train=False, compute_dtype=cdt)
        ce, dice, mse = calc_losses(outs[0], lab.astype(jnp.int32), n_classes)
        return jnp.stack([ce, dice, mse])

    return step_fn, jax.jit(valid_fn)


class TrainEngine:
    """start()/run_epoch()/stop() lifecycle around the jitted SPMD step."""

    def __init__(
        self,
        model: UNet3d,
        param: TrainParam,
        mesh: Mesh | None = None,
        model_path: str = "",
        save_model_during_training: bool = True,
    ):
        self.model = model
        self.param = param
        self.mesh = mesh or make_mesh(n_data=1)
        self.model_path = model_path
        self.save_model_during_training = save_model_during_training
        self.aborted = False
        self.paused = False  # cooperative pause flag (train.hpp:99)
        self.error_msg = ""
        self.reading_status = self.training_status = self.validation_status = "idle"
        self.cur_epoch = 0
        self.dataset: TrainingDataset | None = None
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._batch_cache: tuple | None = None
        self._test_data: list[tuple[jnp.ndarray, jnp.ndarray]] = []
        self.opt_state = None
        self._step_fn = None
        self._valid_fn = None
        self._params = None
        # incremental sample-stream RNG (fast-forwarded only on resume)
        self._sample_rng: np.random.Generator | None = None
        self._rng_pos = -1
        # reader prefetch: epoch e+1's batch assembles while step e runs
        self._prefetch: tuple | None = None
        self._reader = None
        # per-slot load occupancy of the batch being assembled
        self._slot_ready: list[bool] = []

    # ------------------------------------------------------------------ setup

    def start(self) -> None:
        if not self.param.image_file_name:
            self.error_msg = "please specify the training data"
            self.aborted = True
            return
        nproc = jax.process_count()
        if self.param.batch_size % nproc:
            # _local_batch_rows slices b // nproc rows per process; a
            # non-divisible batch would silently drop the trailing rows
            # AND mis-scale gradients (device_step divides by the full
            # batch_size)
            self.error_msg = (
                f"batch_size ({self.param.batch_size}) must be divisible by "
                f"the process count ({nproc}) for multi-host training"
            )
            self.aborted = True
            return
        self.reading_status = "scanning labels"
        self.dataset = TrainingDataset.scan(
            self.param.image_file_name,
            self.param.label_file_name,
            self.model.out_count,
        )
        # commit params/opt state to the mesh (replicated) up front so the
        # first step compiles with the same shardings as every later step
        rep = NamedSharding(self.mesh, P())
        self._params = {
            k: jax.device_put(jnp.asarray(v), rep) for k, v in self.model.params.items()
        }
        self.opt_state = jax.device_put(init_opt_state(self._params), rep)
        self._maybe_load_optimizer()
        # resume epoch derived from the error history (train.cpp:1005)
        self.cur_epoch = (len(self.model.testing_errors) // 3) % self.param.epoch
        self._load_test_volumes()
        self._step_fn, self._valid_fn = build_train_step(
            self.model,
            self.param,
            self.mesh,
            has_subjects=self.dataset.has_subject_data,
            any_shift=any(self.dataset.need_shift),
            collapse_k=int(self.dataset.max_template_label + 1),
        )
        self.training_status = "training"

    def _maybe_load_optimizer(self) -> None:
        opt_path = self.model_path + ".opt" if self.model_path else ""
        if opt_path and os.path.exists(opt_path):
            data = np.load(opt_path)
            # commit resumed state to the mesh (replicated) exactly like the
            # fresh state — uncommitted arrays would force a first-step
            # recompile (train.cpp:945-957 analog)
            rep = NamedSharding(self.mesh, P())
            self.opt_state = jax.device_put(
                {
                    "momentum": {
                        k[len("momentum/") :]: jnp.asarray(v)
                        for k, v in data.items()
                        if k.startswith("momentum/")
                    },
                    "step": jnp.asarray(data["step"]),
                },
                rep,
            )

    def _save_optimizer(self) -> None:
        if not self.model_path:
            return
        arrs = {
            f"momentum/{k}": np.asarray(v)
            for k, v in self.opt_state["momentum"].items()
        }
        arrs["step"] = np.asarray(self.opt_state["step"])
        np.savez(self.model_path + ".opt", **arrs)
        os.replace(self.model_path + ".opt.npz", self.model_path + ".opt")

    def _load_test_volumes(self) -> None:
        self._test_data = []
        for i in self.dataset.test_indices:
            self.reading_status = f"reading {os.path.basename(self.dataset.images[i])}"
            img, lab = self._load_item(i)
            if self.model.out_count == 1:
                mx = lab.max()
                if mx > 0:
                    lab = lab / mx
            self._test_data.append(
                (jnp.asarray(img[..., None])[None], jnp.asarray(lab)[None])
            )

    def _load_item(self, read_id: int) -> tuple[np.ndarray, np.ndarray]:
        """Load + resample one pair; templates cached (train.cpp:404-432)."""
        if read_id in self._cache:
            return self._cache[read_id]
        img, lab = load_pair_on_model_grid(
            self.dataset.images[read_id],
            self.dataset.labels[read_id],
            self.model.dim,
            self.model.voxel_size,
        )
        if not self.param.is_label:
            mx = lab.max()
            if mx > 0:
                lab = lab / mx
        if self.dataset.need_shift[read_id]:
            lab = shift_subject_label(img, lab, self.dataset.max_template_label)
        pair = (img, lab)
        if self.dataset.is_template[read_id]:
            self._cache[read_id] = pair
        return pair

    # ------------------------------------------------------------- epoch loop

    def _epoch_draws(self, epoch: int) -> list[tuple[int, int]]:
        """(seed_id, read_id) picks for one epoch.  The RNG state persists
        between consecutive epochs (O(batch) per call); only a resume or an
        out-of-order request replays the stream from the seed
        (train.cpp:391-399 determinism contract)."""
        ds = self.dataset
        b = self.param.batch_size
        start = epoch * b
        if self._sample_rng is None or self._rng_pos != start:
            self._sample_rng = np.random.default_rng(self.param.seed)
            for seed_id in range(start):
                ds.sample_index(self._sample_rng, seed_id % b, b)
            self._rng_pos = start
        ids = [
            (seed_id, ds.sample_index(self._sample_rng, seed_id % b, b))
            for seed_id in range(start, start + b)
        ]
        self._rng_pos = start + b
        return ids

    def _put_batch_axis(self, arr: np.ndarray, sh):
        """Host array -> global device array sharded on the batch axis.

        Single-process: a plain sharded device_put.  Multi-process (SPMD
        pods, SURVEY.md §5.8): every process passes only ITS rows of the
        global batch and jax assembles the global array from the
        process-local shards — no host ever materializes the full batch.
        """
        if jax.process_count() == 1:
            return jax.device_put(arr, sh)
        return jax.make_array_from_process_local_data(sh, arr)

    def _local_batch_rows(self, b: int) -> slice:
        """The contiguous slice of global batch rows this process loads
        (reference: one host loads everything, train.cpp:259-343; here
        each host reads 1/process_count of the batch)."""
        nproc = jax.process_count()
        per = b // nproc
        lo = jax.process_index() * per
        return slice(lo, lo + per)

    def _assemble_batch(self, epoch: int):
        ds = self.dataset
        ids = self._epoch_draws(epoch)
        base_key = jax.random.key(self.param.seed)
        sh = NamedSharding(self.mesh, P("data"))
        rows = self._local_batch_rows(len(ids))
        keys = [
            jax.random.fold_in(base_key, seed_id) for seed_id, _ in ids[rows]
        ]
        keys_dev = self._put_batch_axis(
            np.asarray(jax.random.key_data(jnp.stack(keys))), sh
        )
        keys_dev = jax.random.wrap_key_data(keys_dev)

        # template-heavy batches repeat the same volumes epoch after epoch
        # (one-template training repeats the SAME batch every epoch): keep
        # the device-resident batch and only refresh the RNG keys
        ids_tuple = tuple(read_id for _, read_id in ids)
        if self._batch_cache is not None and self._batch_cache[0] == ids_tuple:
            images_d, labels_d, tmpl_d, shift_d = self._batch_cache[1]
            return images_d, labels_d, tmpl_d, shift_d, keys_dev

        images, labels, tmpl, shift = [], [], [], []
        local_ids = ids[rows]
        self._slot_ready = [False] * len(local_ids)
        for slot, (_, read_id) in enumerate(local_ids):
            self.reading_status = f"reading {os.path.basename(ds.images[read_id])}"
            img, lab = self._load_item(read_id)
            images.append(img[..., None])
            labels.append(lab)
            tmpl.append(ds.is_template[read_id])
            shift.append(ds.need_shift[read_id])
            self._slot_ready[slot] = True
        batch = (
            self._put_batch_axis(np.stack(images), sh),
            self._put_batch_axis(np.stack(labels), sh),
            self._put_batch_axis(np.asarray(tmpl), sh),
            self._put_batch_axis(np.asarray(shift), sh),
        )
        # cache only when every item is a RAM-cached template (otherwise the
        # device copy would pin arbitrary subject volumes)
        if all(ds.is_template[r] for r in ids_tuple):
            self._batch_cache = (ids_tuple, batch)
        else:
            self._batch_cache = None
        return (*batch, keys_dev)

    def _get_batch(self, epoch: int):
        """Prefetched batch if the reader thread built it, else assemble
        synchronously (the reference's reader-thread overlap,
        train.cpp:259-444)."""
        if self._prefetch is not None:
            pf_epoch, fut = self._prefetch
            self._prefetch = None
            if pf_epoch == epoch:
                return fut.result()
            fut.result()  # drain an out-of-order prefetch (e.g. after resume)
        return self._assemble_batch(epoch)

    def _submit_prefetch(self, epoch: int) -> None:
        if epoch >= self.param.epoch:
            return
        if self._reader is None:
            from concurrent.futures import ThreadPoolExecutor

            self._reader = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="unet-reader"
            )
        self._prefetch = (epoch, self._reader.submit(self._assemble_batch, epoch))

    def run_epoch(self) -> dict:
        e = self.cur_epoch
        lr = float(poly_lr(self.param.learning_rate, e, self.param.epoch))
        images, labels, tmpl, shift, keys = self._get_batch(e)
        self.training_status = "training"
        self._params, self.opt_state, metrics = self._step_fn(
            self._params, self.opt_state, images, labels, tmpl, shift, keys, lr
        )
        # validation on the held-out templates (train.cpp:826-896): dispatch
        # async, THEN kick the reader prefetch, THEN block on the results —
        # the host assembles epoch e+1 while the device trains/validates
        self.validation_status = "validating"
        vals = [
            self._valid_fn(self._params, img, lab) for img, lab in self._test_data
        ]
        self.cur_epoch += 1
        self._submit_prefetch(self.cur_epoch)
        metrics = np.asarray(metrics)
        if metrics[3] > 0:
            errs = (metrics[:3] / metrics[3]).tolist()
            self.model.training_errors.extend(round(float(v), 6) for v in errs)
        if vals:
            acc = np.zeros(3)
            for v in vals:
                acc += np.asarray(v)
            acc /= len(vals)
            self.model.testing_errors.extend(round(float(v), 6) for v in acc)
        # autosave every 100 epochs (train.cpp:780-788)
        if (
            self.save_model_during_training
            and self.model_path
            and self.cur_epoch % 100 == 0
        ):
            self.training_status = "saving model"
            self.sync_params_to_model()
            save_model(self.model_path, self.model)
            self._save_optimizer()
        return {
            "epoch": e,
            "lr": lr,
            "train": self.model.training_errors[-3:],
            "test": self.model.testing_errors[-3:],
        }

    def sync_params_to_model(self) -> None:
        self.model.params = dict(self._params)

    def run(self, chart: bool = True) -> None:
        """Blocking loop to param.epoch (the headless path,
        train.cpp:913-919).  Any failure (unreadable file, device error)
        sets error_msg + aborted instead of escaping — the reference wraps
        every pipeline stage the same way (train.cpp:709-721,791-802)."""
        start = time.time()
        start_epoch = self.cur_epoch
        if chart:
            print("1" + " " * 50 + "0.1" + " " * 47 + "0.01")
        try:
            while self.cur_epoch < self.param.epoch and not self.aborted:
                while self.paused and not self.aborted:
                    time.sleep(0.1)  # cooperative pause (train.hpp:99)
                if self.aborted:
                    break
                info = self.run_epoch()
                if chart:
                    self._print_chart_row(info, start, start_epoch)
        except Exception as exc:  # noqa: BLE001
            self.error_msg = self.error_msg or f"{type(exc).__name__}: {exc}"
            self.aborted = True

    def _print_chart_row(self, info, start_time, start_epoch) -> None:
        """log-scale ASCII error chart (train.cpp:853-888)."""
        e = info["epoch"]
        if e % 100 == 0:
            out = list(
                "|-------------------------|--------------------------|"
                "-------------------------|-------------------------|"
            )
            s = f"lr:{info['lr']:.6f}"
            done = self.cur_epoch - start_epoch
            if done > 0:
                elapsed = time.time() - start_time
                rem = elapsed * (self.param.epoch - self.cur_epoch) / done
                s += f",{int(rem // 3600)}h{int(rem % 3600 // 60)}m"
            out[1 : 1 + len(s)] = s
            print("".join(out))
        out = list(
            "|                         |                          |"
            "                         |                         |"
        )

        def put(val, ch):
            if val <= 0:
                return
            pos = int((-np.log10(max(val, 1e-10))) * (len(out) - 1) / 2.0)
            out[int(np.clip(pos, 0, len(out) - 1))] = ch

        for v, ch in zip(info["train"], "cdm"):
            put(v, ch)
        for v, ch in zip(info["test"], "CDM"):
            put(v, ch)
        print("".join(out) + f" {e}")

    def pause(self) -> None:
        """Cooperative pause: run() idles at the next epoch boundary
        (reference polls `pause` at 100 ms, train.cpp:574)."""
        self.paused = True

    def resume(self) -> None:
        self.paused = False

    def stop(self) -> None:
        self.aborted = True
        self.paused = False
        if self._reader is not None:
            self._reader.shutdown(wait=False)
            self._reader = None
            self._prefetch = None

    def get_status(self) -> str:
        state = "paused" if self.paused else self.training_status
        # per-slot occupancy string, '-' loaded / '_' pending
        # (train.cpp:488-499)
        slots = "".join("-" if r else "_" for r in self._slot_ready)
        return (
            f"epoch {self.cur_epoch}/{self.param.epoch} "
            f"[{slots}] {self.reading_status}|{state}|{self.validation_status}"
        )
