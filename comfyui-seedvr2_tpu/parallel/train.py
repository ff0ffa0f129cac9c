"""Training step: rectified-flow (v_lerp) objective for NaDiT over a mesh.

The reference ships trainer-era configs (configs_*/main.yaml: logitnormal
training timesteps, v_lerp loss, FSDP hybrid-shard) but no trainer code; this
module supplies the TPU-native trainer: sharded flow-matching step with
optax adamw, params sharded fsdp/tp, batch sharded dp, jitted end-to-end so
XLA places the collectives (psum for grad reduction happens implicitly via
the SPMD partitioner).
"""

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..core import diffusion
from ..core.configs import DiTConfig
from ..models.dit.nadit import DiTPlan, nadit_forward
from .mesh import shard_params


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray


def save_train_state(state: TrainState, path: str):
    """Checkpoint the training state (orbax; sharding-aware)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state._asdict(), force=True)


def restore_train_state(path: str, template: TrainState) -> TrainState:
    """Restore onto the template's shardings/dtypes."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template._asdict())
    return TrainState(**restored)


def make_train_step(cfg: DiTConfig, plan: DiTPlan, mesh: Mesh,
                    learning_rate: float = 1e-4, T: float = 1000.0):
    """Build (init_state, train_step) for flow-matching training.

    Batch: dict with
      latent: (B, Tl, h, w, vid_out_channels) clean latents
      cond:   (B, Tl, h, w, vid_in - vid_out) SR condition channels
      txt:    (B, L, txt_in_dim)
    """
    schedule = diffusion.LerpSchedule(T)
    tx = optax.adamw(learning_rate, weight_decay=0.01)

    def init_state(params):
        params = shard_params(mesh, params)
        opt_state = tx.init(params)
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    def loss_fn(params, batch, key):
        x0 = batch["latent"].astype(jnp.float32)
        b = x0.shape[0]
        k_noise, k_t = jax.random.split(key)
        xT = jax.random.normal(k_noise, x0.shape, jnp.float32)
        t = diffusion.logitnormal_timesteps(k_t, (b,), T=T)
        t_e = t[:, None, None, None, None]
        x_t = schedule.forward(x0, xT, t_e)
        target = xT - x0  # v_lerp
        vid_in = jnp.concatenate(
            [x_t.astype(jnp.bfloat16), batch["cond"].astype(jnp.bfloat16)],
            axis=-1)
        pred = nadit_forward(params, cfg, vid_in,
                             batch["txt"].astype(jnp.bfloat16), t, plan)
        return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, key) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return init_state, train_step
