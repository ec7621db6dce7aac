#!/usr/bin/env python3
"""Build NeMo-style JSONL manifests from a directory of audio + transcripts.

Supports LibriSpeech layout (nested dirs with *.trans.txt files) and a
generic layout (a .tsv/.txt file of `utt_id<TAB>text` next to wavs/flacs).
Produces {"audio_filepath", "duration", "text"} lines — the data contract
of reference sample_data/asr_train_data.json.

Usage:
  python -m speech2text_tpu.tools.prepare_manifest \
      --audio_dir /data/LibriSpeech/train-clean-100 \
      --output train.json [--layout librispeech]
"""

from __future__ import annotations

import json
import os
import wave

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("audio_dir", None, "root dir to scan")
flags.DEFINE_string("output", None, "output manifest path")
flags.DEFINE_enum("layout", "librispeech", ["librispeech", "tsv"],
                  "corpus layout")
flags.DEFINE_string("tsv", None, "utt_id<TAB>text table (layout=tsv)")
flags.mark_flag_as_required("audio_dir")
flags.mark_flag_as_required("output")


def wav_duration(path: str) -> float:
    with wave.open(path, "rb") as w:
        return w.getnframes() / w.getframerate()


def librispeech_entries(root: str):
    for dirpath, _, files in os.walk(root):
        trans = [f for f in files if f.endswith(".trans.txt")]
        for t in trans:
            with open(os.path.join(dirpath, t)) as f:
                for line in f:
                    utt, _, text = line.strip().partition(" ")
                    for ext in (".wav", ".flac"):
                        audio = os.path.join(dirpath, utt + ext)
                        if os.path.exists(audio):
                            yield audio, text.lower()
                            break


def tsv_entries(root: str, tsv: str):
    with open(tsv) as f:
        for line in f:
            utt, _, text = line.rstrip("\n").partition("\t")
            for ext in (".wav", ".flac"):
                audio = os.path.join(root, utt + ext)
                if os.path.exists(audio):
                    yield audio, text
                    break


def main(argv):
    del argv
    gen = (librispeech_entries(FLAGS.audio_dir)
           if FLAGS.layout == "librispeech"
           else tsv_entries(FLAGS.audio_dir, FLAGS.tsv))
    n = 0
    with open(FLAGS.output, "w") as out:
        for audio, text in gen:
            if audio.endswith(".flac"):
                # duration via soundfile if available; else skip flac
                try:
                    import soundfile as sf
                    dur = sf.info(audio).duration
                except ImportError:
                    continue
            else:
                dur = wav_duration(audio)
            out.write(json.dumps({"audio_filepath": audio,
                                  "duration": round(dur, 3),
                                  "text": text}) + "\n")
            n += 1
    print(f"wrote {n} entries → {FLAGS.output}")


if __name__ == "__main__":
    app.run(main)
