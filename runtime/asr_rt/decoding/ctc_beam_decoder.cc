#include "asr_rt/decoding/ctc_beam_decoder.h"

#include <algorithm>
#include <cmath>
#include <functional>
#include <unordered_map>

namespace asr_rt {

namespace {
size_t HashHyp(const void* node, int prev_token,
               const NgramLm::State& lm_state,
               const std::vector<int>& words) {
  size_t h = std::hash<const void*>()(node) * 1000003u + prev_token;
  for (int w : lm_state) h = h * 131 + static_cast<size_t>(w + 7);
  for (int w : words) h = h * 137 + static_cast<size_t>(w + 11);
  return h;
}
}  // namespace

void CtcBeamDecoder::Step(std::vector<Hyp>* beam, const float* lp,
                          int V) const {
  // top-k tokens this frame
  std::vector<int> order(V);
  for (int v = 0; v < V; ++v) order[v] = v;
  int k = std::min(opts_.beam_size_token, V);
  std::partial_sort(order.begin(), order.begin() + k, order.end(),
                    [&](int a, int b) { return lp[a] > lp[b]; });

  std::unordered_map<size_t, Hyp> next;
  auto push = [&](Hyp&& h) {
    size_t key = HashHyp(h.node, h.prev_token, h.lm_state, h.words);
    auto it = next.find(key);
    if (it == next.end() || it->second.score < h.score) {
      next[key] = std::move(h);
    }
  };

  for (const Hyp& hyp : *beam) {
    // 1) blank: stay, break repeat chain
    {
      Hyp h = hyp;
      h.score += lp[opts_.blank];
      h.am_score += lp[opts_.blank];
      h.prev_token = -1;
      push(std::move(h));
    }
    // 2) repeat previous non-blank token: no trie advance
    if (hyp.prev_token >= 0) {
      Hyp h = hyp;
      h.score += lp[hyp.prev_token];
      h.am_score += lp[hyp.prev_token];
      push(std::move(h));
    }
    // 3) advance with a new token along the trie
    const TrieNode* node = hyp.node ? hyp.node : trie_->root();
    for (int i = 0; i < k; ++i) {
      int tok = order[i];
      if (tok == opts_.blank || tok == hyp.prev_token) continue;
      const TrieNode* child = node->Child(tok);
      if (child == nullptr) continue;
      // 3a) stay inside the word
      if (!child->children.empty()) {
        Hyp h = hyp;
        h.score += lp[tok];
        h.am_score += lp[tok];
        h.node = child;
        h.tokens.push_back(tok);
        h.prev_token = tok;
        push(std::move(h));
      }
      // 3b) complete any word ending here (LM-scored)
      for (size_t wi = 0; wi < child->labels.size(); ++wi) {
        Hyp h = hyp;
        h.score += lp[tok];
        h.am_score += lp[tok];
        h.tokens.push_back(tok);
        h.prev_token = tok;
        h.node = nullptr;  // back to root for the next word
        int word = child->labels[wi];
        h.words.push_back(word);
        if (lm_ != nullptr) {
          float lm_s = lm_->Score(&h.lm_state, word);
          h.score += opts_.lm_weight * lm_s;
        }
        h.score += opts_.word_score;
        push(std::move(h));
      }
    }
  }

  // prune to beam
  std::vector<Hyp> pruned;
  pruned.reserve(next.size());
  for (auto& kv : next) pruned.push_back(std::move(kv.second));
  std::sort(pruned.begin(), pruned.end(),
            [](const Hyp& a, const Hyp& b) { return a.score > b.score; });
  if (static_cast<int>(pruned.size()) > opts_.beam_size)
    pruned.resize(opts_.beam_size);
  if (!pruned.empty()) {
    float floor = pruned.front().score - opts_.beam_threshold;
    while (!pruned.empty() && pruned.back().score < floor)
      pruned.pop_back();
  }
  *beam = std::move(pruned);
}

DecodeResult CtcBeamDecoder::ToResult(const Hyp& h) {
  DecodeResult r;
  r.score = h.score;
  r.words = h.words;
  r.tokens = h.tokens;
  return r;
}

DecodeResult CtcBeamDecoder::Decode(const float* emissions, int T,
                                    int V) const {
  std::vector<Hyp> beam(1);
  beam[0].lm_state = lm_ ? lm_->BeginState() : NgramLm::State{};
  beam[0].node = nullptr;
  for (int t = 0; t < T; ++t) Step(&beam, emissions + t * V, V);
  // prefer completed-word hypotheses (node == nullptr)
  const Hyp* best = nullptr;
  for (const Hyp& h : beam) {
    if (h.node != nullptr) continue;
    if (best == nullptr || h.score > best->score) best = &h;
  }
  if (best == nullptr && !beam.empty()) best = &beam[0];
  if (best == nullptr) return {};
  return ToResult(*best);
}

void CtcBeamDecoder::DecodeBegin() {
  beam_.assign(1, Hyp{});
  beam_[0].lm_state = lm_ ? lm_->BeginState() : NgramLm::State{};
}

void CtcBeamDecoder::DecodeStep(const float* emissions, int T, int V) {
  for (int t = 0; t < T; ++t) Step(&beam_, emissions + t * V, V);
}

void CtcBeamDecoder::Prune(int beam_size) {
  if (beam_size < 0) beam_size = opts_.beam_size;
  if (static_cast<int>(beam_.size()) > beam_size) beam_.resize(beam_size);
}

DecodeResult CtcBeamDecoder::DecodeEnd() {
  const Hyp* best = nullptr;
  for (const Hyp& h : beam_) {
    if (h.node != nullptr) continue;
    if (best == nullptr || h.score > best->score) best = &h;
  }
  if (best == nullptr && !beam_.empty()) best = &beam_[0];
  if (best == nullptr) return {};
  return ToResult(*best);
}

}  // namespace asr_rt
