"""Flow-matching action head, sigma net, and input projectors.

Ports of:
* FlowMatchingActionHead (prismatic/models/action_heads.py:18-174) — beta-
  sampled flow time, x_t = (1-t)*noise + t*gt, u = noise - gt; `predict_flow`
  runs the DiT over noisy-action tokens with VLM hidden-state context.
* TokenSigmaNet (prismatic/models/noise_net.py:57-179) — same DiT shape, DiT
  computed in float32, tanh-squashed log-sigma in [log(min_std), log(max_std)]
  (run instantiation min_std=0.08, max_std=0.2, fsdp_workers.py:353-358).
* ProprioProjector / NoisyActionProjector (prismatic/models/projectors.py).

All trainable modules (the only ones the RFT optimizer updates,
fsdp_workers.py:435-449) keep float32 params with bf16 compute in the flow
path and f32 compute in the sigma path (noise_net.py:158-165).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vla_rft_tpu.models.dit import DiTConfig, DiTSingleTokenActionOneCtx

ACTION_DIM = 7
NUM_ACTIONS_CHUNK = 8


class MLPProjector(nn.Module):
    """fc1 -> GELU -> fc2 (projectors.py:6-50)."""

    out_dim: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc2")(x)


def sample_beta(rng, alpha: float, beta: float, shape) -> jnp.ndarray:
    """action_heads.py:12-15: gamma_i = U^(1/a); t = g1/(g1+g2)."""
    r1, r2 = jax.random.split(rng)
    g1 = jax.random.uniform(r1, shape) ** (1.0 / alpha)
    g2 = jax.random.uniform(r2, shape) ** (1.0 / beta)
    return g1 / (g1 + g2)


@dataclasses.dataclass(frozen=True)
class ActionHeadConfig:
    llm_dim: int = 896
    action_dim: int = ACTION_DIM
    num_actions_chunk: int = NUM_ACTIONS_CHUNK
    num_flow_steps: int = 10
    dit_hidden: int = 512
    dit_depth: int = 8
    dit_heads: int = 8
    ctx_every: int = 2
    min_std: float = 0.08
    max_std: float = 0.2
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def dit_cfg(self, dtype=None) -> DiTConfig:
        return DiTConfig(
            in_channels=self.action_dim * self.llm_dim,
            out_channels=self.action_dim,
            hidden_size=self.dit_hidden,
            depth=self.dit_depth,
            num_heads=self.dit_heads,
            num_actions=self.num_actions_chunk,
            ctx_every=self.ctx_every,
            llm_dim=self.llm_dim,
            dtype=dtype or self.dtype,
            param_dtype=self.param_dtype,
        )


class FlowMatchingActionHead(nn.Module):
    """predict_flow: noisy actions (B, C, A) + context hidden states ->
    flow field (B, C, A)."""

    cfg: ActionHeadConfig

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (B, S_ctx, llm_dim) VLM context
        noisy_actions: jnp.ndarray,  # (B, chunk, action_dim)
        timesteps: jnp.ndarray,  # (B,) in [0, 1]
        proprio_features: jnp.ndarray,  # (B, llm_dim) projected proprio
        noisy_action_features: jnp.ndarray,  # (B, chunk*action_dim, llm_dim)
    ) -> jnp.ndarray:
        cfg = self.cfg
        B = noisy_actions.shape[0]
        obs = noisy_action_features.reshape(
            B, cfg.num_actions_chunk, cfg.action_dim * cfg.llm_dim
        )
        return DiTSingleTokenActionOneCtx(cfg.dit_cfg(), name="dit")(
            obs, timesteps, hidden_states, proprio_features
        )


class TokenSigmaNet(nn.Module):
    """Per-dim sigma head; float32 DiT compute, tanh-squashed log-std."""

    cfg: ActionHeadConfig

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        noisy_actions: jnp.ndarray,
        timesteps: jnp.ndarray,
        proprio_features: jnp.ndarray,
        noisy_action_features: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        B = noisy_actions.shape[0]
        obs = noisy_action_features.reshape(
            B, cfg.num_actions_chunk, cfg.action_dim * cfg.llm_dim
        ).astype(jnp.float32)
        raw = DiTSingleTokenActionOneCtx(cfg.dit_cfg(dtype=jnp.float32), name="dit")(
            obs,
            timesteps.astype(jnp.float32),
            hidden_states.astype(jnp.float32),
            proprio_features.astype(jnp.float32),
        )
        log_min = math.log(cfg.min_std)
        log_max = math.log(cfg.max_std)
        squashed = jnp.tanh(raw.astype(jnp.float32))
        log_std = log_min + (log_max - log_min) * (squashed + 1.0) * 0.5
        return jnp.exp(log_std), log_std


class ActionExpert(nn.Module):
    """Bundles the trainable modules: flow head + sigma net + the two
    projectors. One flax module so the optimizer sees one param tree
    (reference keeps them as 4 separate DDP modules)."""

    cfg: ActionHeadConfig

    def setup(self):
        self.action_head = FlowMatchingActionHead(self.cfg)
        self.sigma_net = TokenSigmaNet(self.cfg)
        self.proprio_projector = MLPProjector(self.cfg.llm_dim, dtype=self.cfg.dtype)
        self.noisy_action_projector = MLPProjector(self.cfg.llm_dim, dtype=self.cfg.dtype)

    def _project_inputs(self, noisy_actions, proprio):
        cfg = self.cfg
        B = noisy_actions.shape[0]
        flat = noisy_actions.reshape(B, -1, 1)  # (B, chunk*A, 1)
        naf = self.noisy_action_projector(flat.astype(cfg.dtype))
        pf = self.proprio_projector(proprio.reshape(B, -1).astype(cfg.dtype))
        return naf, pf

    def predict_flow(self, hidden_states, noisy_actions, timesteps, proprio):
        """action_heads.py:98-132 with projector plumbing."""
        naf, pf = self._project_inputs(noisy_actions, proprio)
        return self.action_head(hidden_states, noisy_actions, timesteps, pf, naf)

    def predict_std(self, hidden_states, noisy_actions, timesteps, proprio):
        """noise_net.py:130-175."""
        naf, pf = self._project_inputs(noisy_actions, proprio)
        return self.sigma_net(hidden_states, noisy_actions, timesteps, pf, naf)

    def __call__(self, hidden_states, noisy_actions, timesteps, proprio):
        flow = self.predict_flow(hidden_states, noisy_actions, timesteps, proprio)
        std, log_std = self.predict_std(hidden_states, noisy_actions, timesteps, proprio)
        return flow, std, log_std


def sample_noisy_actions(
    rng: jax.Array, gt_actions: jnp.ndarray, cfg: ActionHeadConfig
) -> Dict[str, jnp.ndarray]:
    """FlowMatchingActionHead.sample_noisy_actions (action_heads.py:63-96).

    Returns noise (the rollout start point), flow target u = noise - gt,
    noisy actions x_t, and timesteps t (stored for the gated BC MSE loss).
    Noise is drawn in bf16 like the reference (sample_noise, :46-55).
    """
    B = gt_actions.shape[0]
    r_noise, r_time = jax.random.split(rng)
    noise = jax.random.normal(
        r_noise, (B, cfg.num_actions_chunk, cfg.action_dim), jnp.float32
    ).astype(jnp.bfloat16)
    t_beta = sample_beta(r_time, 1.5, 1.0, (B,))
    timesteps = (t_beta * 0.999 + 0.001).astype(jnp.bfloat16)
    t = timesteps[:, None, None].astype(jnp.float32)
    noise_f = noise.astype(jnp.float32)
    noisy = (1.0 - t) * noise_f + t * gt_actions.astype(jnp.float32)
    flow = noise_f - gt_actions.astype(jnp.float32)
    return {
        "noise": noise,
        "flow": flow.astype(jnp.bfloat16),
        "gt_noisy_actions": noisy.astype(jnp.bfloat16),
        "gt_timesteps": timesteps,
    }
