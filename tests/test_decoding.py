"""Decoding tests: exact CTC collapse semantics on hand-built logits
(mirrors reference model/decoding_test.py:21-116), RNN-T greedy/beam on a
controlled fake joiner, reference_decoder round trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from speech2text_tpu.data.tokenizer import CharTokenizer
from speech2text_tpu.decoding import (CtcGreedyDecoding,

                                      CtcPrefixBeamDecoding,
                                      RnntBeamDecoding, RnntGreedyDecoding,
                                      ctc_greedy_reduce, reference_decoder)

pytestmark = pytest.mark.quick

TOK = CharTokenizer()  # labels: <blank_id>, <unk>, a..z, ', ' ', <sos/eos>


def one_hot_logits(ids, V, scale=5.0):
    """(T,) ids → (T, V) logits peaking at ids."""
    T = len(ids)
    out = np.full((T, V), -1.0, np.float32)
    out[np.arange(T), ids] = scale
    return out


class TestCtcGreedy:

    def test_collapse_semantics(self):
        V = len(TOK)
        a, b, c = TOK.encode("abc").tolist()
        # frames: a a <b> a b b <b> <b> c
        ids = [a, a, 0, a, b, b, 0, 0, c]
        lp = one_hot_logits(ids, V)[None]
        toks, counts = ctc_greedy_reduce(jnp.asarray(lp), jnp.asarray([9]))
        assert int(counts[0]) == 4
        np.testing.assert_array_equal(np.asarray(toks[0, :4]), [a, a, b, c])
        sess = CtcGreedyDecoding(TOK)
        assert sess.decode(jnp.asarray(lp), jnp.asarray([9])) == ["aabc"]

    def test_length_masking(self):
        V = len(TOK)
        a, b = TOK.encode("ab").tolist()
        ids = [a, 0, b, b, b]
        lp = one_hot_logits(ids, V)[None]
        sess = CtcGreedyDecoding(TOK)
        # full length → "ab"; truncated to 2 → "a"
        assert sess.decode(jnp.asarray(lp), jnp.asarray([5])) == ["ab"]
        assert sess.decode(jnp.asarray(lp), jnp.asarray([2])) == ["a"]

    def test_all_blank(self):
        V = len(TOK)
        lp = one_hot_logits([0, 0, 0], V)[None]
        sess = CtcGreedyDecoding(TOK)
        assert sess.decode(jnp.asarray(lp), jnp.asarray([3])) == [""]

    def test_prefix_beam_matches_greedy_on_peaked(self):
        V = len(TOK)
        a, b, c = TOK.encode("abc").tolist()
        ids = [a, 0, b, 0, c]
        lp = np.log(np.maximum(
            np.exp(one_hot_logits(ids, V, scale=8.0))
            / np.exp(one_hot_logits(ids, V, scale=8.0)).sum(-1,
                                                            keepdims=True),
            1e-10))
        sess = CtcPrefixBeamDecoding(TOK, beam_size=4)
        assert sess.decode(lp[None], np.asarray([5])) == ["abc"]

    def test_prefix_beam_matches_numpy_oracle(self):
        """Jitted batched prefix beam ≡ host dict-based oracle on random
        soft logits. V=6 ≤ the oracle's per-frame shortlist (max(2·beam,
        8)) and cand_size=V, so both see the full vocabulary and the two
        recursions coincide exactly (same merges, same top-K mass)."""
        rng = np.random.default_rng(7)
        V, B, T = 6, 5, 12
        lp = np.log(rng.dirichlet(np.ones(V), size=(B, T))
                    .astype(np.float32))
        lens = np.asarray([12, 1, 7, 3, 12])

        class IdTok:
            def decode(self, ids):
                return " ".join(str(int(i)) for i in ids)

        sess = CtcPrefixBeamDecoding(IdTok(), beam_size=4, cand_size=V)
        got = sess.decode(lp, lens)
        want = [sess._decode_one_numpy(lp[b, :lens[b]]) for b in range(B)]
        assert got == want

    def test_prefix_beam_merges_duplicate_prefixes(self):
        """Two paths to the same prefix ("a·a" via blank vs "a" repeat …)
        must merge mass: soft logits where greedy (argmax per frame) and
        summed-prefix-mass disagree. The classic case: blank-dominated
        frames whose non-blank mass all belongs to one token — prefix
        beam must return that token, greedy returns empty."""
        V = len(TOK)
        a = TOK.encode("a").tolist()[0]
        lp = np.full((1, 3, V), -12.0, np.float32)
        # each frame: p(blank)=0.48, p(a)=0.40 split across paths,
        # rest tiny — per-frame argmax is blank, but total mass of
        # prefix "a" (emitted in any frame, others blank) exceeds the
        # all-blank path's 0.48³.
        lp[0, :, 0] = np.log(0.48)
        lp[0, :, a] = np.log(0.40)
        greedy = CtcGreedyDecoding(TOK).decode(
            jnp.asarray(lp), jnp.asarray([3]))
        beam = CtcPrefixBeamDecoding(TOK, beam_size=4).decode(
            lp, np.asarray([3]))
        assert greedy == [""]
        assert beam == ["a"]


def fake_rnnt_sessions(V, beam=False, **kw):
    """Fake predictor/joiner: predictor state = last token embedding-free;
    joiner logp = log_softmax(enc_frame) (predictor ignored) — so greedy
    follows per-frame argmax with transducer emission rules."""
    import jax

    def pred_step(params, token, state):
        return jnp.zeros((token.shape[0], 1, 4), jnp.float32), state

    def pred_init(B):
        return jnp.zeros((B, 1), jnp.int32)

    def join(params, enc_frame, pred_out):
        return jax.nn.log_softmax(enc_frame, axis=-1)

    cls = RnntBeamDecoding if beam else RnntGreedyDecoding
    return cls(TOK, pred_step, pred_init, join, **kw)


class TestRnntGreedy:

    def test_emission_rules(self):
        V = len(TOK)
        a, b = TOK.encode("ab").tolist()
        # frames: emit a, blank, emit b, blank
        enc = one_hot_logits([a, 0, b, 0], V)[None]
        sess = fake_rnnt_sessions(V)
        out = sess.decode(None, jnp.asarray(enc), jnp.asarray([4]))
        assert out == ["ab"]

    def test_max_token_step_bounds_emissions(self):
        V = len(TOK)
        a = TOK.encode("a").tolist()[0]
        enc = one_hot_logits([a, a], V)[None]
        # fake joiner ignores predictor → same argmax repeats within frame
        sess1 = fake_rnnt_sessions(V, max_token_step=1)
        out1 = sess1.decode(None, jnp.asarray(enc), jnp.asarray([2]))
        assert out1 == ["aa"]
        sess2 = fake_rnnt_sessions(V, max_token_step=3)
        out2 = sess2.decode(None, jnp.asarray(enc), jnp.asarray([2]))
        assert out2 == ["aaaaaa"]  # 3 per frame × 2 frames

    def test_length_masking(self):
        V = len(TOK)
        a, b = TOK.encode("ab").tolist()
        enc = one_hot_logits([a, b], V)[None]
        sess = fake_rnnt_sessions(V)
        assert sess.decode(None, jnp.asarray(enc), jnp.asarray([1])) == ["a"]


class TestRnntBeam:

    def test_beam1_matches_greedy(self):
        V = len(TOK)
        rng = np.random.default_rng(3)
        enc = rng.standard_normal((2, 6, V)).astype(np.float32)
        lens = np.asarray([6, 4])
        g = fake_rnnt_sessions(V, max_token_step=1)
        b = fake_rnnt_sessions(V, beam=True, beam_size=1, cutoff_top_k=1)
        assert g.decode(None, jnp.asarray(enc), jnp.asarray(lens)) == \
            b.decode(None, jnp.asarray(enc), jnp.asarray(lens))

    def test_beam_runs_wider(self):
        V = len(TOK)
        rng = np.random.default_rng(4)
        enc = rng.standard_normal((1, 5, V)).astype(np.float32)
        sess = fake_rnnt_sessions(V, beam=True, beam_size=4, cutoff_top_k=3)
        out = sess.decode(None, jnp.asarray(enc), jnp.asarray([5]))
        assert len(out) == 1 and isinstance(out[0], str)


def test_reference_decoder():
    ids = TOK.encode("hello world")
    labels = np.zeros((1, 16), np.int32)
    labels[0, :len(ids)] = ids
    out = reference_decoder(labels, np.asarray([len(ids)]), TOK)
    assert out == ["hello world"]


class TestRnntBeamLmFusion:
    """Neural-LM shallow fusion (extension beyond the reference): the LM
    distribution must be able to flip the beam's choice on an acoustic
    tie, and lm_weight=0 must reproduce the unfused result."""

    def _sessions(self, V, lm_bias_token, lm_weight):
        import jax

        def pred_step(params, token, state):
            return jnp.zeros((token.shape[0], 1, 4), jnp.float32), state

        def pred_init(B):
            return jnp.zeros((B, 1), jnp.int32)

        def join(params, enc_frame, pred_out):
            return jax.nn.log_softmax(enc_frame, axis=-1)

        def lm_init(B):
            return jnp.zeros((B, 1), jnp.int32)

        def lm_step(params, token, state):
            # static LM strongly preferring one token
            dist = jnp.full((token.shape[0], V), -10.0)
            dist = dist.at[:, lm_bias_token].set(0.0)
            return dist, state

        return RnntBeamDecoding(TOK, pred_step, pred_init, join,
                                beam_size=2, cutoff_top_k=2,
                                lm_step=lm_step, lm_init=lm_init,
                                lm_weight=lm_weight)

    def test_lm_flips_acoustic_tie(self):
        V = len(TOK)
        a, b = TOK.encode("ab").tolist()
        enc = np.full((1, 1, V), -8.0, np.float32)
        enc[0, 0, a] = 2.0
        enc[0, 0, b] = 2.0 + 1e-4  # acoustically b barely wins
        no_lm = self._sessions(V, a, 0.0)
        assert no_lm.decode(None, jnp.asarray(enc), jnp.asarray([1])) == ["b"]
        with_lm = self._sessions(V, a, 1.0)
        assert with_lm.decode(None, jnp.asarray(enc),
                              jnp.asarray([1])) == ["a"]


class TestRnntBeamMerging:
    """Duplicate-hypothesis merging (reference model/decoding.py:278-425
    keys beams by token prefix): probability mass of a prefix reached via
    emit-then-blank and blank-then-emit must combine, and the combined
    mass can beat a single-path competitor."""

    def test_merge_changes_winner(self):
        V = len(TOK)
        a, b = TOK.encode("ab").tolist()
        # frame 1: p(blank)=0.3, p(a)=0.25, p(b)=0.45
        # frame 2: p(blank)=0.5, p(a)=0.5,  p(b)≈0
        # "a" mass = .25*.5 + .3*.5 = .275 (two paths, merged)
        # "b" mass ≈ .45*.5 = .225 (one path)
        # Unmerged, the single best path is "b" (.225 > .15); merged, "a".
        f1 = np.full((V,), -30.0, np.float32)
        f1[0], f1[a], f1[b] = np.log([0.3, 0.25, 0.45])
        f2 = np.full((V,), -30.0, np.float32)
        f2[0], f2[a] = np.log([0.5, 0.5])
        enc = np.stack([f1, f2])[None]  # (1, 2, V)
        sess = fake_rnnt_sessions(V, beam=True, beam_size=3, cutoff_top_k=2)
        out = sess.decode(None, jnp.asarray(enc), jnp.asarray([2]))
        assert out == ["a"]
