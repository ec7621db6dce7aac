"""ctypes binding to the C++ lexicon CTC beam decoder (runtime/).

Gives the Python inference path the deployment-grade lexicon+n-gram-LM
decoder (reference uses flashlight-text via torchaudio's `ctc_decoder`,
model/decoding.py:85-154; here it's our own runtime/ C++ library).

Build first:  cmake -S runtime -B runtime/build -G Ninja && ninja -C runtime/build
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "runtime", "build",
                 "libasr_rt_c.so"),
)


def _load_lib() -> Optional[ctypes.CDLL]:
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.s2t_decoder_create.restype = ctypes.c_void_p
            lib.s2t_decoder_create.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_int]
            lib.s2t_decoder_add_word.restype = ctypes.c_int
            lib.s2t_decoder_add_word.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_float]
            lib.s2t_decoder_finalize.argtypes = [ctypes.c_void_p]
            lib.s2t_decoder_decode.restype = ctypes.c_int
            lib.s2t_decoder_decode.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
                ctypes.c_int]
            lib.s2t_decoder_word.restype = ctypes.c_char_p
            lib.s2t_decoder_word.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.s2t_decoder_destroy.argtypes = [ctypes.c_void_p]
            return lib
    return None


def runtime_available() -> bool:
    return _load_lib() is not None


class CtcLexiconBeamDecoding:
    """Lexicon-constrained CTC beam decode via the C++ runtime.

    lexicon: {word: [token ids]} (spellings in the acoustic token space);
    arpa_path: optional n-gram LM (words must match the lexicon's).
    Decode input: (B, T, V) log-probs + lengths → list of texts.
    """

    def __init__(self, lexicon: Dict[str, Sequence[int]],
                 arpa_path: str | None = None, beam_size: int = 16,
                 beam_size_token: int = 8, lm_weight: float = 1.0,
                 word_score: float = 0.0, blank: int = 0):
        self._lib = _load_lib()
        if self._lib is None:
            raise RuntimeError(
                "libasr_rt_c.so not built — run: cmake -S runtime -B "
                "runtime/build -G Ninja && ninja -C runtime/build")
        self._h = self._lib.s2t_decoder_create(
            (arpa_path or "").encode(), beam_size, beam_size_token,
            lm_weight, word_score, blank)
        if not self._h:
            raise RuntimeError(f"failed to load ARPA LM {arpa_path}")
        for word, spelling in lexicon.items():
            arr = (ctypes.c_int * len(spelling))(*spelling)
            self._lib.s2t_decoder_add_word(self._h, word.encode(), arr,
                                           len(spelling), 0.0)
        self._lib.s2t_decoder_finalize(self._h)

    def decode(self, log_probs, lengths) -> List[str]:
        lp = np.ascontiguousarray(np.asarray(log_probs), np.float32)
        lens = np.asarray(lengths)
        out: List[str] = []
        max_words = 512
        buf = (ctypes.c_int * max_words)()
        for b in range(lp.shape[0]):
            T = int(lens[b])
            V = lp.shape[2]
            ptr = lp[b, :T].ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            n = self._lib.s2t_decoder_decode(self._h, ptr, T, V, buf,
                                             max_words)
            words = [self._lib.s2t_decoder_word(self._h, buf[i]).decode()
                     for i in range(max(n, 0))]
            out.append(" ".join(words))
        return out

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.s2t_decoder_destroy(self._h)
            self._h = None
