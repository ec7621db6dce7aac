// ARPA-format n-gram language model with backoff scoring.
//
// Capability parity with the KenLM scoring exercised by the reference's
// runtime gtest (reference runtime/asr_rt/decoding/fl_decoder_test.cc:60-95
// asserts exact backoff arithmetic): scores are log10 probabilities, and
// score(w | h) falls back to backoff(h) + score(w | shorter h) when the
// full n-gram is absent.
#pragma once

#include <string>
#include <unordered_map>
#include <vector>

namespace asr_rt {

class NgramLm {
 public:
  // State = the word-id history (most recent last), capped at order-1.
  using State = std::vector<int>;

  bool LoadArpa(const std::string& path);

  int order() const { return order_; }
  int WordId(const std::string& word) const;
  const std::string& WordOf(int id) const { return words_[id]; }
  int bos() const { return bos_; }
  int eos() const { return eos_; }
  int unk() const { return unk_; }

  State BeginState() const;
  // Returns log10 p(word | state) and advances the state.
  float Score(State* state, int word) const;
  // Score of a full sentence (BOS ... EOS), for tests.
  float SentenceScore(const std::vector<std::string>& words) const;

 private:
  struct Entry {
    float logp = 0.f;
    float backoff = 0.f;
    bool has_backoff = false;
  };
  // key: word ids joined; maps per n-gram order
  static std::string Key(const int* ids, int n);
  const Entry* Find(const int* ids, int n) const;

  int order_ = 0;
  std::vector<std::string> words_;
  std::unordered_map<std::string, int> word_ids_;
  std::vector<std::unordered_map<std::string, Entry>> grams_;  // [n-1]
  int bos_ = -1, eos_ = -1, unk_ = -1;
};

}  // namespace asr_rt
