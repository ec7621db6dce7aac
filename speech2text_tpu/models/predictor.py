"""Transducer predictors (label-side networks): Stateless + LSTM.

Parity with reference model/predictor/:
- StatelessPredictor (stateless_predictor.py:27-237): embedding + causal
  depthwise Conv1d over the last `context_size` tokens (n-gram style);
  state = last context_size-1 token ids.
- LstmPredictor (lstm_predictor.py:28-109): embedding + LSTM stack; blank
  (id 0) is prepended to targets to form the U+1 predictor input.

Both expose:
  __call__(targets (B, U)) → (pred_out (B, U+1, output_dim), out_lens)
  streaming_step(tokens/state) for decode loops (jit-friendly, fixed shapes)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass
class StatelessPredictorConfig:
    num_symbols: int = 128
    output_dim: int = 256
    symbol_embedding_dim: int = 512
    context_size: int = 5
    dtype: str = "float32"


@dataclasses.dataclass
class LstmPredictorConfig:
    num_symbols: int = 128
    output_dim: int = 256
    symbol_embedding_dim: int = 512
    num_lstm_layers: int = 2
    lstm_hidden_dim: int = 512
    blank_as_sos: bool = True
    dtype: str = "float32"


def _dt(name):
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


class StatelessPredictor(nn.Module):
    config: StatelessPredictorConfig

    def setup(self):
        cfg = self.config
        self.embed = nn.Embed(cfg.num_symbols, cfg.symbol_embedding_dim,
                              dtype=_dt(cfg.dtype))
        if cfg.context_size > 1:
            # bias-free like the reference (stateless_predictor.py:46-55);
            # a conv bias would be redundant with the output Dense's bias
            self.conv = nn.Conv(features=cfg.symbol_embedding_dim,
                                kernel_size=(cfg.context_size,),
                                padding="VALID", use_bias=False,
                                feature_group_count=cfg.symbol_embedding_dim,
                                dtype=_dt(cfg.dtype))
        self.out = nn.Dense(cfg.output_dim, dtype=_dt(cfg.dtype))

    def _net(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens (B, L) already left-padded with context: returns (B, L', D)
        where L' = L - (context_size - 1).

        No activation between conv and the output linear — matching the
        reference exactly (stateless_predictor.py:75-99: embedding →
        depthwise conv → output_linear; the joiner applies the only
        nonlinearity, joiner.py:44-49). icefall's Decoder has a ReLU here;
        this reference does not, and the converted-weight parity oracle
        (tests/test_zipformer_ref_oracle.py) pins the reference's form."""
        cfg = self.config
        h = self.embed(tokens)
        if cfg.context_size > 1:
            h = self.conv(h)
        return self.out(h).astype(jnp.float32)

    def __call__(self, targets: jnp.ndarray,
                 target_lengths: jnp.ndarray | None = None):
        """targets (B, U) → pred_out (B, U+1, output_dim).

        Row u of the output conditions on tokens y_1..y_u (row 0 = blank
        context only), matching the (B, 1+U) convention the joiner expects
        (reference joiner.py:138-141)."""
        cfg = self.config
        B, U = targets.shape
        ctx = jnp.full((B, cfg.context_size), 0, dtype=jnp.int32)
        tokens = jnp.concatenate([ctx, targets.astype(jnp.int32)], axis=1)
        out = self._net(tokens)  # (B, U + context, ...) → trimmed by conv
        out = out[:, -(U + 1):] if cfg.context_size > 1 else out[:, -(U + 1):]
        if target_lengths is None:
            return out
        return out, target_lengths.astype(jnp.int32) + 1

    def init_state(self, batch_size: int) -> jnp.ndarray:
        """(B, context_size - 1) blank token ids."""
        n = max(self.config.context_size - 1, 1)
        return jnp.zeros((batch_size, n), jnp.int32)

    def streaming_step(self, token: jnp.ndarray, state: jnp.ndarray):
        """token (B,) last emitted token; state (B, context-1) previous ids.
        Returns (pred_out (B, 1, output_dim), new_state)."""
        tokens = jnp.concatenate([state, token.astype(jnp.int32)[:, None]],
                                 axis=1)                     # (B, context)
        out = self._net(tokens)[:, -1:, :]
        new_state = tokens[:, 1:]
        return out, new_state


class LstmPredictor(nn.Module):
    config: LstmPredictorConfig

    def setup(self):
        cfg = self.config
        self.embed = nn.Embed(cfg.num_symbols, cfg.symbol_embedding_dim,
                              dtype=_dt(cfg.dtype))
        self.rnns = [
            nn.RNN(nn.OptimizedLSTMCell(cfg.lstm_hidden_dim,
                                        dtype=_dt(cfg.dtype)))
            for _ in range(cfg.num_lstm_layers)
        ]
        self.out = nn.Dense(cfg.output_dim, dtype=_dt(cfg.dtype))

    def _run(self, tokens: jnp.ndarray, states):
        """tokens (B, L); states: list of (c, h) per layer."""
        outs = self.embed(tokens)                            # (B, L, E)
        new_states = []
        for i, rnn in enumerate(self.rnns):
            carry, outs = rnn(outs, initial_carry=states[i],
                              return_carry=True)
            new_states.append(carry)
        return self.out(outs).astype(jnp.float32), new_states

    def init_state(self, batch_size: int):
        cfg = self.config
        zeros = jnp.zeros((batch_size, cfg.lstm_hidden_dim), _dt(cfg.dtype))
        return [(zeros, zeros) for _ in range(cfg.num_lstm_layers)]

    def __call__(self, targets: jnp.ndarray,
                 target_lengths: jnp.ndarray | None = None):
        """targets (B, U) → (B, U+1, output_dim); input = blank ⊕ targets."""
        B, U = targets.shape
        tokens = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), targets.astype(jnp.int32)], axis=1)
        out, _ = self._run(tokens, self.init_state(B))
        if target_lengths is None:
            return out
        return out, target_lengths.astype(jnp.int32) + 1

    def streaming_step(self, token: jnp.ndarray, state):
        out, new_state = self._run(token.astype(jnp.int32)[:, None], state)
        return out, new_state
