"""Expert-parallel scan: sub-bands sharded across devices, stitched after
an all-gather (SURVEY.md §2.3 EP row; BASELINE.json config 4).

Each retune band's curscan is independent (the reference runs them
serially, kspecanal.py:621-693), so the per-band windowed-FFT work — all
the FLOPs — shards perfectly across the mesh 'band' axis.  The
order-dependent overlap-average stitch (kspecanal.py:642-650) needs every
band's spectrum, so the per-band display spectra are all-gathered (one
collective of num_bands * fft_size floats — tiny next to the IQ) and the
stitch fold runs replicated on every device.

Band counts are padded up to a multiple of the shard count with sentinel
bands (all-ones, the same marker used for failed retunes) that are sliced
off after the gather — shapes stay static for any sweep geometry.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from kspecanal_tpu.config import SpecConfig
from kspecanal_tpu.models.scan import (ScanPlan, ScanState, band_spectra,
                                       stitch_sweep)


def _pad_bands(x: jax.Array, padded: int) -> jax.Array:
    pad = padded - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])


@functools.lru_cache(maxsize=16)
def _build_sweep_sharded(cfg: SpecConfig, plan: ScanPlan, mesh: Mesh):
    s = mesh.shape["band"]
    padded = -(-plan.num_bands // s) * s

    def body(state, iq_re, iq_im, retune_ok, adj):
        # Local bands only: (padded/S, full_size)
        spectra_local = band_spectra(iq_re, iq_im, retune_ok, cfg)
        spectra = jax.lax.all_gather(spectra_local, "band", tiled=True)
        spectra = spectra[: plan.num_bands]
        return stitch_sweep(state, spectra, cfg, plan, adj)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("band"), P("band"), P("band"), P()),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def run(state: ScanState, iq_re, iq_im, retune_ok, adj) -> ScanState:
        return fn(state,
                  _pad_bands(iq_re, padded),
                  _pad_bands(iq_im, padded),
                  _pad_bands(retune_ok, padded),
                  adj)

    return run


def sweep_step_band_sharded(state: ScanState, iq_re: jax.Array,
                            iq_im: jax.Array, retune_ok: jax.Array,
                            cfg: SpecConfig, plan: ScanPlan,
                            mesh: Mesh, adj: jax.Array = None) -> ScanState:
    """Drop-in sharded ``models.scan.sweep_step_jit``: same
    (state, (B, full_size) IQ, (B,) ok-flags) -> state contract, with the
    band axis sharded over the mesh.  ``adj`` (replicated) feeds the
    heatmap row's baseline adjustment exactly as in the single-device
    stitch."""
    run = _build_sweep_sharded(cfg, plan, mesh)
    if adj is None:
        # shard_map in_specs are static: pass a concrete zero baseline.
        adj = jnp.zeros(plan.total_entries, jnp.float32)
    return run(state, iq_re, iq_im, retune_ok, adj)
