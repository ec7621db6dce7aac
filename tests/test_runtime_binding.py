"""ctypes binding tests for the C++ lexicon CTC beam decoder.

Skipped unless runtime/build/libasr_rt_c.so exists (run_tests.sh builds
it before the Python suite when cmake/ninja are available)."""

import os
import subprocess

import numpy as np
import pytest

from speech2text_tpu.runtime_binding import (CtcLexiconBeamDecoding,
                                             runtime_available)

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _ensure_built():
    if runtime_available():
        return True
    try:
        subprocess.run(["cmake", "-S", "runtime", "-B", "runtime/build",
                        "-G", "Ninja"], cwd=ROOT, check=True,
                       capture_output=True, timeout=180)
        subprocess.run(["ninja", "-C", "runtime/build"], cwd=ROOT,
                       check=True, capture_output=True, timeout=180)
    except Exception:
        return False
    return runtime_available()


pytestmark = pytest.mark.skipif(not _ensure_built(),
                                reason="C++ runtime not buildable here")

# token ids: 0=<blank>, 1=t, 2=h, 3=e, 4=c, 5=a
LEXICON = {"the": [1, 2, 3], "cat": [4, 5, 1], "tea": [1, 3, 5]}


def peaked(ids, V=6):
    em = np.full((len(ids), V), np.log(0.01), np.float32)
    em[np.arange(len(ids)), ids] = np.log(0.95)
    return em


def test_lexicon_decode_no_lm():
    dec = CtcLexiconBeamDecoding(LEXICON)
    em = peaked([1, 2, 3, 0, 4, 5, 1])[None]
    out = dec.decode(em, np.asarray([7]))
    assert out == ["the cat"]


def test_lexicon_constrains_to_vocabulary():
    dec = CtcLexiconBeamDecoding(LEXICON)
    # "t e a" → only 'tea' is spellable (no word 'tae' etc.)
    em = peaked([1, 3, 5])[None]
    out = dec.decode(em, np.asarray([3]))
    assert out == ["tea"]


def test_arpa_lm_fusion(tmp_path):
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=5\nngram 2=2\n\n\\1-grams:\n"
        "-0.5 <s> -0.3\n-1.0 </s>\n-0.7 the -0.2\n-0.9 cat -0.1\n"
        "-1.5 tea -0.1\n\n\\2-grams:\n-0.3 <s> the\n-0.2 the cat\n\n"
        "\\end\\\n")
    dec = CtcLexiconBeamDecoding(LEXICON, arpa_path=str(arpa),
                                 lm_weight=2.0)
    # acoustic tie on the last token: c-a-[t|?]; 'cat' must win via LM
    em = peaked([1, 2, 3, 0, 4, 5, 1])[None]
    em[0, 6, 1] = np.log(0.45)
    em[0, 6, 3] = np.log(0.45)
    out = dec.decode(em, np.asarray([7]))
    assert out[0].startswith("the")


def test_batch_and_lengths():
    dec = CtcLexiconBeamDecoding(LEXICON)
    em = np.stack([peaked([1, 2, 3, 0, 0, 0, 0]),
                   peaked([4, 5, 1, 0, 1, 3, 5])])
    out = dec.decode(em, np.asarray([3, 7]))
    assert out[0] == "the"
    assert out[1] == "cat tea"
