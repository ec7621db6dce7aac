"""RNN language model for NNLM training and decode rescoring.

Parity with reference model/lm/rnn_lm.py:26-100: embedding → LSTM stack →
logits; `score` over full sequences and `score_step` for beam-search
fusion.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass
class RnnLmConfig:
    num_symbols: int = 128
    embedding_dim: int = 256
    hidden_dim: int = 512
    num_layers: int = 2
    dtype: str = "float32"


class RnnLm(nn.Module):
    config: RnnLmConfig

    def setup(self):
        cfg = self.config
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self.embed = nn.Embed(cfg.num_symbols, cfg.embedding_dim, dtype=dt)
        self.rnns = [nn.RNN(nn.OptimizedLSTMCell(cfg.hidden_dim, dtype=dt))
                     for _ in range(cfg.num_layers)]
        self.out = nn.Dense(cfg.num_symbols, dtype=dt)

    def init_state(self, batch_size: int):
        cfg = self.config
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        zeros = jnp.zeros((batch_size, cfg.hidden_dim), dt)
        return [(zeros, zeros) for _ in range(cfg.num_layers)]

    def _run(self, tokens, states):
        h = self.embed(tokens.astype(jnp.int32))
        outs = h
        new_states = []
        for i, rnn in enumerate(self.rnns):
            carry, outs = rnn(outs, initial_carry=states[i],
                              return_carry=True)
            new_states.append(carry)
        return self.out(outs).astype(jnp.float32), new_states

    def __call__(self, tokens: jnp.ndarray):
        """tokens (B, L) → logits (B, L, V)."""
        logits, _ = self._run(tokens, self.init_state(tokens.shape[0]))
        return logits

    def score(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """Full-sequence log-probs of each next token (B, L-1) for decode
        rescoring (reference rnn_lm.py:67-100)."""
        logits = self(tokens[:, :-1])
        lp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.take_along_axis(lp, tokens[:, 1:, None].astype(jnp.int32),
                                   axis=2)[..., 0]

    def score_step(self, token: jnp.ndarray, state):
        """One-step scoring for shallow fusion: token (B,) → (log-probs
        (B, V), new_state)."""
        logits, new_state = self._run(token[:, None], state)
        return jax.nn.log_softmax(logits[:, 0], axis=-1), new_state
