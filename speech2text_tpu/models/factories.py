"""String-keyed model factories (reference factory-pattern parity).

Encoder keys: "Conformer", "Emformer", "Zipformer", "Wav2Vec2"
  (reference model/encoder/encoder.py:22-31)
Decoder keys: "Identity", "Projector" (model/decoder/decoder.py:21-25)
Predictor keys: "Lstm", "Stateless" (model/predictor/predictor.py:23-30)
"""

from __future__ import annotations

from ..config import from_dict
from .conformer import Conformer, ConformerConfig
from .decoder import (IdentityDecoder, IdentityDecoderConfig,
                      ProjectorDecoder, ProjectorDecoderConfig)
from .joiner import Joiner, JoinerConfig
from .predictor import (LstmPredictor, LstmPredictorConfig,
                        StatelessPredictor, StatelessPredictorConfig)


def EncoderFactory(config: dict):
    model = config["model"]
    cfg = config.get("config", {})
    if model == "Conformer":
        return Conformer(from_dict(ConformerConfig, cfg))
    if model == "Zipformer":
        from .zipformer import Zipformer2, Zipformer2Config
        return Zipformer2(Zipformer2Config.from_config(cfg))
    if model == "Emformer":
        from .emformer import Emformer, EmformerConfig
        return Emformer(from_dict(EmformerConfig, cfg))
    if model == "Wav2Vec2":
        from .wav2vec2 import Wav2Vec2Encoder, Wav2Vec2Config
        return Wav2Vec2Encoder(from_dict(Wav2Vec2Config, cfg))
    raise ValueError(f"unknown encoder {model}")


def DecoderFactory(config: dict):
    model = config["model"]
    cfg = config.get("config", {})
    if model == "Identity":
        return IdentityDecoder(from_dict(IdentityDecoderConfig, cfg))
    if model == "Projector":
        return ProjectorDecoder(from_dict(ProjectorDecoderConfig, cfg))
    raise ValueError(f"unknown decoder {model}")


def PredictorFactory(config: dict):
    model = config["model"]
    cfg = config.get("config", {})
    if model == "Stateless":
        return StatelessPredictor(from_dict(StatelessPredictorConfig, cfg))
    if model == "Lstm":
        return LstmPredictor(from_dict(LstmPredictorConfig, cfg))
    raise ValueError(f"unknown predictor {model}")


def JoinerFactory(config: dict):
    return Joiner(from_dict(JoinerConfig, config))
