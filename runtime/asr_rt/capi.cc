// C API for the lexicon CTC beam decoder (ctypes-consumable from Python).
//
// Bridges the deployment C++ decoder into the Python inference path
// (reference exposes flashlight's decoder to Python through torchaudio;
// here a minimal C surface + ctypes serves the same purpose without a
// build-time Python dependency).

#include <cstring>
#include <memory>
#include <string>
#include <vector>

#include "asr_rt/decoding/ctc_beam_decoder.h"
#include "asr_rt/decoding/lexicon_trie.h"
#include "asr_rt/decoding/ngram_lm.h"

namespace {

struct Handle {
  asr_rt::NgramLm lm;
  bool has_lm = false;
  asr_rt::LexiconTrie trie;
  std::unique_ptr<asr_rt::CtcBeamDecoder> decoder;
  asr_rt::DecoderOptions opts;
  std::vector<std::string> words;  // decoder word-id → string
};

}  // namespace

extern "C" {

void* s2t_decoder_create(const char* arpa_path, int beam_size,
                         int beam_size_token, float lm_weight,
                         float word_score, int blank) {
  auto* h = new Handle();
  if (arpa_path != nullptr && std::strlen(arpa_path) > 0) {
    if (!h->lm.LoadArpa(arpa_path)) {
      delete h;
      return nullptr;
    }
    h->has_lm = true;
  }
  h->opts.beam_size = beam_size;
  h->opts.beam_size_token = beam_size_token;
  h->opts.lm_weight = lm_weight;
  h->opts.word_score = word_score;
  h->opts.blank = blank;
  return h;
}

// Returns the decoder-internal word id (LM id when an LM is loaded).
int s2t_decoder_add_word(void* handle, const char* word,
                         const int* spelling, int spelling_len,
                         float score) {
  auto* h = static_cast<Handle*>(handle);
  int word_id;
  if (h->has_lm) {
    word_id = h->lm.WordId(word);
  } else {
    word_id = static_cast<int>(h->words.size());
  }
  // keep a dense word table for result mapping
  if (word_id >= static_cast<int>(h->words.size()))
    h->words.resize(word_id + 1);
  h->words[word_id] = word;
  std::vector<int> sp(spelling, spelling + spelling_len);
  h->trie.Insert(sp, word_id, score);
  return word_id;
}

void s2t_decoder_finalize(void* handle) {
  auto* h = static_cast<Handle*>(handle);
  h->trie.Smear();
  h->decoder.reset(new asr_rt::CtcBeamDecoder(
      &h->trie, h->has_lm ? &h->lm : nullptr, h->opts));
}

// emissions: T×V row-major log-probs. Writes up to max_words word ids.
// Returns the number of words decoded (or -1 on error).
int s2t_decoder_decode(void* handle, const float* emissions, int T, int V,
                       int* out_words, int max_words) {
  auto* h = static_cast<Handle*>(handle);
  if (!h->decoder) return -1;
  asr_rt::DecodeResult r = h->decoder->Decode(emissions, T, V);
  int n = static_cast<int>(r.words.size());
  if (n > max_words) n = max_words;
  for (int i = 0; i < n; ++i) out_words[i] = r.words[i];
  return n;
}

// word id → string (valid until the handle is destroyed)
const char* s2t_decoder_word(void* handle, int word_id) {
  auto* h = static_cast<Handle*>(handle);
  if (word_id < 0 || word_id >= static_cast<int>(h->words.size()))
    return "";
  return h->words[word_id].c_str();
}

void s2t_decoder_destroy(void* handle) {
  delete static_cast<Handle*>(handle);
}

}  // extern "C"
