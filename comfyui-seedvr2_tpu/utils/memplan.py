"""Memory-aware VAE tile planning: ``--vae_*_tile_size auto``.

The reference leaves tile sizing to the user (README VRAM tables; the
tiled paths in attn_video_vae.py:1294-1624 take whatever tile_size the
node passes) and recovers from bad picks by catching OOM at runtime
(memory_manager.py:350-392). On TPU we can do better than trial and
error: XLA's ahead-of-time ``memory_analysis`` reports a compiled
program's exact HBM demand WITHOUT allocating, so a too-big candidate
cannot crash the process. ``plan_auto_tile`` walks a descending ladder
of tile-area caps, plans the uniform grid each cap produces
(pipeline_vae._plan_grid), probes the per-tile program's memory, adds
the analytically-known orchestration buffers (output accumulator,
stacked crops, resident input), and serves the fewest-tiles grid that
fits the budget — i.e. the minimum-redundancy decode the chip can hold,
on any TPU generation, without shipping hand-tuned constants.

Probe results persist to ``~/.cache/seedvr2_tpu/memprobe.json`` keyed by
device kind + program signature, so the compile cost is paid once per
machine (and the compiled executable itself lands in the persistent jit
cache, so a probed-then-chosen tile shape costs nothing extra to serve).
"""

import json
import os
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Descending pixel-side caps. The tile constraint is AREA (the grid
# planner shapes tiles freely under cap^2), so the ladder only needs
# enough resolution that adjacent rungs plan different grids.
DECODE_LADDER = (1536, 1280, 1152, 1088, 1024, 896, 768, 640, 512, 384,
                 256)
ENCODE_LADDER = (2176, 1536, 1280, 1088, 1024, 896, 768, 640, 512, 384,
                 256)

# headroom for XLA scratch/fragmentation the analysis can't see
_SAFETY_BYTES = 600_000_000

_CACHE_LOCK = threading.Lock()
_CACHE_MEM = None  # in-process mirror of the JSON file


def _cache_path() -> str:
    return os.environ.get(
        "SEEDVR2_MEMPROBE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "seedvr2_tpu",
                     "memprobe.json"))


def _load_cache() -> dict:
    global _CACHE_MEM
    if _CACHE_MEM is None:
        try:
            with open(_cache_path()) as f:
                _CACHE_MEM = json.load(f)
        except (OSError, ValueError):
            _CACHE_MEM = {}
    return _CACHE_MEM


def _store_cache(key: str, value: int) -> None:
    global _CACHE_MEM
    with _CACHE_LOCK:
        cache = _load_cache()
        cache[key] = value
        path = _cache_path()
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(cache, f, indent=0, sort_keys=True)
            os.replace(tmp, path)
        except OSError:
            pass  # cache is an optimization; never fail the plan


def reset_cache_for_tests() -> None:
    global _CACHE_MEM
    with _CACHE_LOCK:
        _CACHE_MEM = None


def _vae_signature(vae) -> str:
    from ..models.vae import model as vae_model

    cfg = vae.cfg
    dev = jax.devices()[0]
    return "|".join(str(x) for x in (
        dev.platform, getattr(dev, "device_kind", ""),
        jnp.dtype(vae.dtype).name, cfg.block_out_channels,
        cfg.layers_per_block, cfg.latent_channels, cfg.norm_num_groups,
        cfg.conv_quant,
        # legacy-family structure switches change the traced program
        cfg.mid_attention, cfg.use_quant_conv, cfg.use_post_quant_conv,
        cfg.time_receptive_field,
        # lowering switches change the per-tile HBM demand (im2col
        # materializes a taps-major patch tensor; conv-transpose upsample
        # skips the shuffle temp). Prefer the instance's construction-time
        # snapshot over the mutable globals (ADVICE r4 #3).
        getattr(vae, "_im2col_max_k", vae_model._IM2COL_MAX_K),
        getattr(vae, "_upsample_convt", vae_model._UPSAMPLE_CONVT),
        getattr(vae, "_head_correction", vae_model._HEAD_CORRECTION)))


def probe_tile_bytes(vae, kind: str, batch: int, frames: int,
                     th_lat: int, tw_lat: int) -> int:
    """Compile-only HBM demand (args + temps + outputs) of one tile's
    encode/decode program at the given latent tile shape. ``frames`` is
    pixel frames T for encode, latent frames Tl for decode."""
    key = "|".join(str(x) for x in (
        _vae_signature(vae), kind, batch, frames, th_lat, tw_lat))
    cached = _load_cache().get(key)
    if cached is not None:
        return int(cached)

    from ..models.vae.pipeline_vae import _decode_slices, _encode_slices

    cfg, sf = vae.cfg, vae.cfg.spatial_downsample_factor
    # trace under the instance's construction-time switch snapshot
    # (VideoVAE._pinned) so the probed program is the one the signature
    # describes, even if a tool mutated the module globals since
    pin = getattr(vae, "_pinned", jax.jit)
    if kind == "decode":
        shape = (batch, frames, th_lat, tw_lat, cfg.latent_channels)
        fn = pin(lambda p, z: _decode_slices(p, cfg, z))
    else:
        shape = (batch, frames, th_lat * sf, tw_lat * sf, 3)
        fn = pin(lambda p, x: _encode_slices(p, cfg, x))
    arg = jax.ShapeDtypeStruct(shape, vae.dtype)
    mem = fn.lower(vae.params, arg).compile().memory_analysis()
    total = int(mem.temp_size_in_bytes + mem.argument_size_in_bytes
                + mem.output_size_in_bytes)
    _store_cache(key, total)
    return total


def _overhead_bytes(kind: str, batch: int, frames_px: int, h_lat: int,
                    w_lat: int, n_tiles: int, th: int, tw: int,
                    tl: int, sf: int, latc: int, dtype) -> int:
    """Orchestration buffers outside the per-tile program (exact shapes,
    no compile needed)."""
    dt = jnp.dtype(dtype).itemsize
    if kind == "decode":
        # scan path (pipeline_vae._decode_tiled_scan): stacked crops +
        # f32 output accumulator (update is carry-aliased; x2 covers the
        # final normalize/cast copy) + bf16 result
        crops = n_tiles * batch * tl * th * tw * latc * dt
        acc = batch * frames_px * h_lat * sf * w_lat * sf * 3 * 4
        return crops + 2 * acc + acc // 2
    # encode: the full pixel input stays resident while tiles slice from
    # it; the latent accumulator is negligible but counted
    inp = batch * frames_px * h_lat * sf * w_lat * sf * 3 * dt
    acc = 2 * batch * tl * h_lat * w_lat * latc * 4
    return inp + acc


def plan_auto_tile(vae, kind: str, lat_hw: Tuple[int, int], batch: int,
                   frames_px: int, overlap_px: Tuple[int, int],
                   budget_bytes: int, debug=None,
                   ladder=None) -> Optional[Tuple[int, int]]:
    """Pick the largest tile cap (px) whose full serving program fits
    ``budget_bytes``; ``None`` means untiled fits. ``lat_hw`` is the
    whole image in latent units; ``frames_px`` the pixel frame count.

    Falls back to the smallest ladder rung if nothing fits (the runtime
    OOM-shrink loop takes it from there)."""
    from ..models.vae.pipeline_vae import _plan_grid

    cfg, sf = vae.cfg, vae.cfg.spatial_downsample_factor
    h, w = lat_hw
    tl = (frames_px - 1) // cfg.temporal_downsample_factor + 1
    dec_frames = tl  # decode probes take latent frames
    if ladder is None:
        ladder = DECODE_LADDER if kind == "decode" else ENCODE_LADDER

    # candidates: untiled (only when the image is not far beyond the top
    # rung — probing a hopeless giant shape wastes a long compile), then
    # ladder caps that actually tile the image, deduped by planned grid
    candidates = []  # (cap_px or None, n_tiles, th, tw)
    if h * w <= (ladder[0] // sf) ** 2 * 2:
        candidates.append((None, 1, h, w))
    seen = set()
    for cap in ladder:
        lt = max(1, cap // sf)
        if lt >= h and lt >= w:
            continue  # same as untiled
        # the serving path clamps the overlap to lt-1 per tile size
        # (pipeline_vae.encode/decode) — plan with the same clamp so the
        # memory verdict is for the grid that actually executes
        ov = (max(0, min(overlap_px[0] // sf, lt - 1)),
              max(0, min(overlap_px[1] // sf, lt - 1)))
        # same cost model as the serving path (decode plans by the
        # measured aspect model) so the memory verdict is for the grid
        # that actually executes
        ys, th, xs, tw = _plan_grid(
            h, w, lt * lt, *ov,
            cost="aspect" if kind == "decode" else "area")
        sig = (th, tw, len(ys), len(xs))
        if sig in seen:
            continue
        seen.add(sig)
        candidates.append((cap, len(ys) * len(xs), th, tw))

    frames = dec_frames if kind == "decode" else frames_px
    any_probe_ok = False
    for cap, n_tiles, th, tw in candidates:
        try:
            tile_b = probe_tile_bytes(vae, kind, batch, frames, th, tw)
            any_probe_ok = True
        except Exception as exc:  # noqa: BLE001 — probe failure != OOM
            if debug is not None:
                debug.log(f"auto-tile probe failed at cap={cap}: "
                          f"{exc!r}"[:200], level="WARNING",
                          category="memplan")
            continue
        if cap is None:
            total = tile_b + _SAFETY_BYTES
        else:
            total = tile_b + _overhead_bytes(
                kind, batch, frames_px, h, w, n_tiles, th, tw, tl, sf,
                cfg.latent_channels, vae.dtype) + _SAFETY_BYTES
        fits = total <= budget_bytes
        if debug is not None:
            debug.log(
                f"auto-tile {kind}: cap={cap} grid={n_tiles} tiles of "
                f"{th}x{tw} (latent) needs {total / 1e9:.2f} GB vs "
                f"budget {budget_bytes / 1e9:.2f} -> "
                f"{'FITS' if fits else 'no'}", category="memplan")
        if fits:
            return None if cap is None else (cap, cap)
    if not any_probe_ok:
        # probes BROKE (memory_analysis unsupported, compile errors) —
        # that is not a "nothing fits" verdict; serve the fixed default
        # rather than the worst rung's massively redundant grid
        if debug is not None:
            debug.log(
                f"auto-tile {kind}: every memory probe failed; serving "
                "the fixed 1024px default", level="WARNING",
                category="memplan", force=True)
        return (1024, 1024)
    if debug is not None:
        debug.log(
            f"auto-tile {kind}: nothing on the ladder fits "
            f"{budget_bytes / 1e9:.2f} GB; serving smallest rung "
            f"{ladder[-1]} and relying on the OOM-shrink retry",
            level="WARNING", category="memplan", force=True)
    return (ladder[-1], ladder[-1])
