"""Model layer: encoders, predictors, joiner, decoders + factories.

Factory surface parity with the reference's string-keyed dispatch
(model/encoder/encoder.py:22-31, model/decoder/decoder.py:21-25,
model/predictor/predictor.py:23-30).
"""

from .cmvn import GlobalCmvn, compute_cmvn_stats  # noqa: F401
from .factories import (DecoderFactory, EncoderFactory,  # noqa: F401
                        PredictorFactory)
