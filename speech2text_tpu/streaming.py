"""End-to-end streaming ASR deployment session.

One jitted function per chunk covers the WHOLE deployment path: raw PCM →
streaming kaldi-fbank framing (carried sample tail) → global CMVN →
zipformer `streaming_prime`/`streaming_step` (six caches per layer) →
stateless-predictor + joiner greedy transducer continuation (carried
predictor state / token buffer). Transcripts are bit-identical to the
offline chunk-masked decode (`metric.encoder_streaming`) on the same audio
— asserted in tests/test_streaming_session.py.

Reference surfaces covered: zipformer chunked `streaming_step`
(/root/reference/model/encoder/zipformer.py:601-663), predictor
`streaming_step` (stateless_predictor.py:107-237), joiner single-frame join
(joiner.py:184-207), and the decode loop of RnntGreedyDecoding
(decoding.py:196-271) — here as a `lax.scan` continuation that carries its
state across chunk boundaries instead of restarting per utterance.

Framing arithmetic (snip_edges=True, 25 ms / 10 ms):
  frames(n) = 1 + (n − flen)//shift, so a stream needs a carried tail of
  (flen − shift) samples. The first chunk must produce
  2·chunk_size + Zipformer2.PRIME_EXTRA_RAW fbank frames (fills the causal
  ConvNeXt receptive field → exact parity from frame 0), every later chunk
  exactly 2·chunk_size frames (the frontend halves the rate, so the
  encoder advances by chunk_size per step with no drift).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.zipformer import Zipformer2


class StreamingAsrSession:
    """Per-chunk streaming decode over a trained RNN-T family task.

    Usage:
        sess = StreamingAsrSession(task, params, chunk_size=32)
        state = sess.init_state(batch_size=1)
        state = sess.prime(pcm[:, :sess.prime_samples], state)
        for off in range(sess.prime_samples, N, sess.step_samples):
            state = sess.step(pcm[:, off:off + sess.step_samples], state)
        texts = sess.texts(state)
    """

    def __init__(self, task, params, chunk_size: int = 32,
                 left_context_chunks: int = 4, max_tokens: int = 256,
                 max_token_step: int = 1):
        enc = task.model.encoder
        assert isinstance(enc, Zipformer2), \
            "streaming session requires a Zipformer2 encoder"
        self.task = task
        self.params = params
        self.model = task.model
        self.tokenizer = task.tokenizer
        self.chunk = int(chunk_size)
        self.left_chunks = int(left_context_chunks)
        self.cap = int(max_tokens)
        self.max_token_step = max(1, int(max_token_step))
        fb = task.frontend.cfg
        self._flen, self._shift = fb.frame_length, fb.frame_shift
        assert fb.snip_edges, "streaming framing requires snip_edges"
        self._prime_frames = 2 * self.chunk + Zipformer2.PRIME_EXTRA_RAW
        self._step_frames = 2 * self.chunk
        # carried tail keeps framing continuous across chunk boundaries
        self._tail = self._flen - self._shift
        self.prime_samples = (self._prime_frames - 1) * self._shift \
            + self._flen
        self.step_samples = self._step_frames * self._shift
        self._jit_prime = jax.jit(partial(self._chunk_fn, prime=True))
        self._jit_step = jax.jit(partial(self._chunk_fn, prime=False))

    # -------------------------------------------------------------- state
    def init_state(self, batch_size: int) -> Dict[str, Any]:
        B = batch_size
        enc_state = dict(self.model.encoder.init_streaming_state(
            B, self.chunk, self.left_chunks))
        # static under jit; re-injected inside the traced chunk function
        enc_state.pop("chunk_size", None)
        pred_state = self.model.predictor.init_state(B)
        return {
            "enc": enc_state,
            "pred_state": pred_state,
            "pred_out": None,      # filled on prime (needs params)
            "tokens": jnp.zeros((B, self.cap), jnp.int32),
            "counts": jnp.zeros((B,), jnp.int32),
            "pcm_tail": jnp.zeros((B, self._tail), jnp.float32),
        }

    # ----------------------------------------------------------- internals
    def _featurize(self, pcm: jnp.ndarray) -> jnp.ndarray:
        B, n = pcm.shape
        feats, _ = self.task.frontend(
            pcm, jnp.full((B,), n, jnp.int32))
        return self.task.cmvn(feats)

    def _greedy_continue(self, params, enc_out, carry):
        """RnntGreedyDecoding's frame loop, resumable across chunks."""
        model = self.model
        B = enc_out.shape[0]
        pred_state, pred_out, tokens, counts = carry

        def frame(c, enc_t):
            state, pred_out, tokens, counts = c
            for _ in range(self.max_token_step):
                logp = model.apply({"params": params}, enc_t,
                                   pred_out[:, 0],
                                   method=model.joiner_step)
                tok = jnp.argmax(logp, axis=-1).astype(jnp.int32)
                emit = (tok != 0) & (counts < self.cap)
                slot = jnp.arange(self.cap, dtype=jnp.int32)
                write = emit[:, None] & (slot[None, :] == counts[:, None])
                tokens = jnp.where(write, tok[:, None], tokens)
                counts = counts + emit.astype(jnp.int32)
                new_pred, new_state = model.apply(
                    {"params": params}, tok, state,
                    method=model.predictor_step)
                pred_out = jnp.where(emit[:, None, None], new_pred,
                                     pred_out)
                state = jax.tree.map(
                    lambda n_, o: jnp.where(
                        emit.reshape((B,) + (1,) * (o.ndim - 1)), n_, o),
                    new_state, state)
            return (state, pred_out, tokens, counts), None

        carry, _ = jax.lax.scan(frame,
                                (pred_state, pred_out, tokens, counts),
                                enc_out.swapaxes(0, 1))
        return carry

    def _chunk_fn(self, params, pcm, state, prime: bool):
        pcm = jnp.concatenate([state["pcm_tail"], pcm], axis=1) \
            if not prime else pcm
        feats = self._featurize(pcm)
        n_frames = self._prime_frames if prime else self._step_frames
        feats = feats[:, :n_frames]
        method = (Zipformer2.streaming_prime if prime
                  else Zipformer2.streaming_step)
        # chunk_size must stay a static Python int under jit (the encoder
        # asserts on it at trace time); keep it out of the traced pytree
        enc_in = dict(state["enc"])
        enc_in["chunk_size"] = self.chunk
        enc_out, enc_state = self.model.apply(
            {"params": params}, feats, enc_in,
            method=lambda m, f, s: method(m.encoder, f, s))
        enc_state = dict(enc_state)
        enc_state.pop("chunk_size", None)   # stays static, not in pytree
        pred_out = state["pred_out"]
        if pred_out is None:   # first chunk: prime the blank predictor
            B = pcm.shape[0]
            pred_out, pred_state = self.model.apply(
                {"params": params}, jnp.zeros((B,), jnp.int32),
                state["pred_state"], method=self.model.predictor_step)
        else:
            pred_state = state["pred_state"]
        pred_state, pred_out, tokens, counts = self._greedy_continue(
            params, enc_out.astype(jnp.float32),
            (pred_state, pred_out, state["tokens"], state["counts"]))
        return {
            "enc": enc_state,
            "pred_state": pred_state,
            "pred_out": pred_out,
            "tokens": tokens,
            "counts": counts,
            "pcm_tail": pcm[:, -self._tail:],
        }

    # ------------------------------------------------------------- public
    def prime(self, pcm: jnp.ndarray, state: Dict[str, Any]):
        assert pcm.shape[1] == self.prime_samples, \
            f"prime needs {self.prime_samples} samples, got {pcm.shape[1]}"
        return self._jit_prime(self.params, jnp.asarray(pcm, jnp.float32),
                               state)

    def step(self, pcm: jnp.ndarray, state: Dict[str, Any]):
        assert pcm.shape[1] == self.step_samples, \
            f"step needs {self.step_samples} samples, got {pcm.shape[1]}"
        return self._jit_step(self.params, jnp.asarray(pcm, jnp.float32),
                              state)

    def texts(self, state) -> List[str]:
        tokens = np.asarray(state["tokens"])
        counts = np.asarray(state["counts"])
        return [self.tokenizer.decode(tokens[i, :counts[i]])
                for i in range(tokens.shape[0])]

    # ------------------------------------------------------------ utility
    def run_utterance(self, pcm: np.ndarray,
                      measure_latency: bool = False
                      ) -> Tuple[List[str], List[float]]:
        """Stream a whole (B, N) utterance chunk by chunk; returns
        (texts, per-chunk wall latencies in ms — empty unless measured).
        Trailing samples that don't fill a chunk are dropped (a deployment
        would pad with silence and flush)."""
        pcm = np.asarray(pcm, np.float32)
        if pcm.ndim == 1:
            pcm = pcm[None]
        state = self.init_state(pcm.shape[0])
        lat: List[float] = []
        off = self.prime_samples
        if pcm.shape[1] < off:
            pad = np.zeros((pcm.shape[0], off - pcm.shape[1]), np.float32)
            pcm = np.concatenate([pcm, pad], axis=1)
        t0 = time.perf_counter()
        state = self.prime(pcm[:, :off], state)
        if measure_latency:
            jax.block_until_ready(state["counts"])
            float(state["counts"][0])      # host fence (axon-safe)
            lat.append((time.perf_counter() - t0) * 1e3)
        while off + self.step_samples <= pcm.shape[1]:
            t0 = time.perf_counter()
            state = self.step(pcm[:, off:off + self.step_samples], state)
            if measure_latency:
                float(state["counts"][0])
                lat.append((time.perf_counter() - t0) * 1e3)
            off += self.step_samples
        return self.texts(state), lat
