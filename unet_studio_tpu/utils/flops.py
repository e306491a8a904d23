"""Analytic FLOPs/bytes model of the U-Net forward pass + chip peaks.

Used by bench.py to report ABSOLUTE utilization (MFU, bandwidth fraction)
next to the raw throughput numbers, so a regression or a sandbagged
figure is visible without cross-round context.  The reference has no
analog (it publishes no numbers at all, BASELINE.md); the roofline
figures here were previously only in ROUND3_NOTES.

The walker mirrors ``models.unet3d.forward``'s traversal exactly
(encoder sweep with skips, decoder levels with head + tail) so spatial
dimensions per layer are the real ones.
"""

from __future__ import annotations

import math

from ..models.dsl import LayerSpec, UNetSpec

# (bf16 matmul FLOP/s, HBM bytes/s) per chip, from published TPU specs
_CHIP_PEAKS = {
    "TPU v4": (275e12, 1228e9),
    "TPU v5 lite": (197e12, 819e9),  # v5e; device_kind reports "TPU v5 lite"
    "TPU v5e": (197e12, 819e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v5": (459e12, 2765e9),
    "TPU v6 lite": (918e12, 1640e9),
    "TPU v6e": (918e12, 1640e9),
    "TPU v7x": (2307e12, 3276e9),
}


def chip_peaks(device_kind: str) -> tuple[float, float] | None:
    """(peak bf16 FLOP/s, peak HBM bytes/s) for a jax device_kind, or
    None when unknown (CPU, new chip)."""
    for k in sorted(_CHIP_PEAKS, key=len, reverse=True):
        if device_kind.startswith(k):
            return _CHIP_PEAKS[k]
    return None


def _layer_cost(layer: LayerSpec, dims: list[int], bytes_per_el: int):
    """(flops, hbm_bytes, out_dims) for one layer at input spatial dims.

    FLOPs: 2*MACs for conv/conv_trans (the MXU terms; norm/act/pool are
    counted as 0 FLOPs — they are bandwidth, not MXU, work).
    Bytes: one read of the input + one write of the output + weights
    (the XLA-fused lower bound)."""
    vox_in = math.prod(dims)
    if layer.kind == "conv":
        out_dims = [d // layer.stride for d in dims] if layer.stride == 2 else dims
        vox_out = math.prod(out_dims)
        flops = 2 * vox_out * layer.ks**3 * layer.in_c * layer.out_c
        wbytes = layer.ks**3 * layer.in_c * layer.out_c * bytes_per_el
        return (
            flops,
            (vox_in * layer.in_c + vox_out * layer.out_c) * bytes_per_el + wbytes,
            out_dims,
        )
    if layer.kind == "conv_trans":
        out_dims = [d * 2 for d in dims]
        flops = 2 * vox_in * 8 * layer.in_c * layer.out_c
        wbytes = 8 * layer.in_c * layer.out_c * bytes_per_el
        return (
            flops,
            (vox_in * layer.in_c + math.prod(out_dims) * layer.out_c) * bytes_per_el
            + wbytes,
            out_dims,
        )
    if layer.kind == "max_pool":
        return 0, 2 * vox_in * layer.in_c * bytes_per_el, [d // 2 for d in dims]
    if layer.kind == "upsample":
        out_dims = [d * 2 for d in dims]
        return (
            0,
            (vox_in + math.prod(out_dims)) * layer.in_c * bytes_per_el,
            out_dims,
        )
    # norm/bnorm: ~2 reads + 1 write (stats pass fused to one read here)
    return 0, 3 * vox_in * layer.in_c * bytes_per_el, dims


def forward_cost(spec: UNetSpec, dhw, bytes_per_el: int = 2) -> tuple[int, int]:
    """(flops, hbm_bytes) of one forward pass at grid ``dhw`` (batch 1),
    walking encoders/decoders/heads/tails exactly as forward() does."""
    flops = 0
    bbytes = 0

    def run_seq(layers, dims):
        nonlocal flops, bbytes
        for layer in layers:
            f, b, dims = _layer_cost(layer, dims, bytes_per_el)
            flops += f
            bbytes += b
        return dims

    n_enc = len(spec.encoders)
    dims = list(dhw)
    skip_dims = []
    for level in range(n_enc):
        dims = run_seq(spec.encoders[level], dims)
        if level < n_enc - 1:
            skip_dims.append(dims)

    for level in range(n_enc - 2, -1, -1):
        dims = skip_dims[level]  # cat(skip, up) — same spatial dims
        dims = run_seq(spec.decoders[level], dims)
        if spec.heads[level]:
            run_seq(spec.heads[level], dims)
        if spec.tails[level]:
            dims = run_seq(spec.tails[level], dims)
    return flops, bbytes


def train_step_flops(spec: UNetSpec, dhw, bytes_per_el: int = 2) -> int:
    """Model FLOPs of one fwd+bwd item: backward costs ~2x forward
    (dL/dx and dL/dw are each one conv-sized contraction per conv)."""
    f, _ = forward_cost(spec, dhw, bytes_per_el)
    return 3 * f
