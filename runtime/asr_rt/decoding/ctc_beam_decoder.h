// Lexicon-constrained CTC beam decoder with n-gram LM fusion.
//
// Capability parity with the flashlight-text LexiconDecoder the reference
// wraps for deployment (reference runtime gtest runs it in one-shot and
// streaming decodeBegin/decodeStep/prune/decodeEnd modes,
// fl_decoder_test.cc:159-225). Emissions are (T, V) log-prob rows in plain
// float buffers (exported from the JAX side; no torch dependency).
#pragma once

#include <string>
#include <vector>

#include "asr_rt/decoding/lexicon_trie.h"
#include "asr_rt/decoding/ngram_lm.h"

namespace asr_rt {

struct DecoderOptions {
  int beam_size = 16;
  int beam_size_token = 8;   // top-k tokens expanded per frame
  float beam_threshold = 20.f;
  float lm_weight = 1.0f;
  float word_score = 0.f;    // bonus per emitted word
  int blank = 0;
  int sil_token = -1;        // optional word-delimiter token (e.g. '▁')
};

struct DecodeResult {
  float score = 0.f;
  // word ids in the LM's id space — trie labels MUST be NgramLm::WordId
  // values (flashlight convention: lexicon maps word → LM index)
  std::vector<int> words;
  std::vector<int> tokens;   // token ids (collapsed)
};

class CtcBeamDecoder {
 public:
  CtcBeamDecoder(const LexiconTrie* trie, const NgramLm* lm,
                 DecoderOptions opts)
      : trie_(trie), lm_(lm), opts_(opts) {}

  // one-shot decode over T frames of V log-probs
  DecodeResult Decode(const float* emissions, int T, int V) const;

  // streaming API
  void DecodeBegin();
  void DecodeStep(const float* emissions, int T, int V);
  void Prune(int beam_size = -1);
  DecodeResult DecodeEnd();

 private:
  struct Hyp {
    float score = 0.f;
    float am_score = 0.f;
    const TrieNode* node = nullptr;   // position inside current word
    NgramLm::State lm_state;
    std::vector<int> words;
    std::vector<int> tokens;
    int prev_token = -1;              // last emitted (non-blank) token
  };
  void Step(std::vector<Hyp>* beam, const float* frame, int V) const;
  static DecodeResult ToResult(const Hyp& h);

  const LexiconTrie* trie_;
  const NgramLm* lm_;
  DecoderOptions opts_;
  std::vector<Hyp> beam_;  // streaming state
};

}  // namespace asr_rt
