#include "asr_rt/decoding/ngram_lm.h"

#include <cmath>
#include <cstring>
#include <fstream>
#include <sstream>

namespace asr_rt {

namespace {
std::vector<std::string> Split(const std::string& line) {
  std::vector<std::string> out;
  std::istringstream iss(line);
  std::string tok;
  while (iss >> tok) out.push_back(tok);
  return out;
}
}  // namespace

int NgramLm::WordId(const std::string& word) const {
  auto it = word_ids_.find(word);
  if (it == word_ids_.end()) return unk_;
  return it->second;
}

std::string NgramLm::Key(const int* ids, int n) {
  std::string key;
  key.reserve(n * 5);
  for (int i = 0; i < n; ++i) {
    key.append(reinterpret_cast<const char*>(&ids[i]), sizeof(int));
  }
  return key;
}

const NgramLm::Entry* NgramLm::Find(const int* ids, int n) const {
  if (n <= 0 || n > order_) return nullptr;
  const auto& m = grams_[n - 1];
  auto it = m.find(Key(ids, n));
  if (it == m.end()) return nullptr;
  return &it->second;
}

bool NgramLm::LoadArpa(const std::string& path) {
  std::ifstream f(path);
  if (!f) return false;
  std::string line;
  int cur_order = 0;
  bool in_data = false;
  std::vector<int> counts;
  auto intern = [&](const std::string& w) {
    auto it = word_ids_.find(w);
    if (it != word_ids_.end()) return it->second;
    int id = static_cast<int>(words_.size());
    words_.push_back(w);
    word_ids_[w] = id;
    return id;
  };
  while (std::getline(f, line)) {
    while (!line.empty() && (line.back() == '\r' || line.back() == '\n'))
      line.pop_back();
    if (line == "\\data\\") {
      in_data = true;
      continue;
    }
    if (line.rfind("ngram ", 0) == 0 && in_data) {
      counts.push_back(1);  // count values unused; just track order
      continue;
    }
    if (!line.empty() && line[0] == '\\') {
      if (line == "\\end\\") break;
      // "\N-grams:"
      cur_order = std::atoi(line.c_str() + 1);
      if (cur_order > order_) order_ = cur_order;
      if (static_cast<int>(grams_.size()) < cur_order)
        grams_.resize(cur_order);
      continue;
    }
    if (cur_order == 0 || line.empty()) continue;
    auto parts = Split(line);
    if (static_cast<int>(parts.size()) < cur_order + 1) continue;
    Entry e;
    e.logp = std::strtof(parts[0].c_str(), nullptr);
    std::vector<int> ids(cur_order);
    for (int i = 0; i < cur_order; ++i) ids[i] = intern(parts[1 + i]);
    if (static_cast<int>(parts.size()) > cur_order + 1) {
      e.backoff = std::strtof(parts[cur_order + 1].c_str(), nullptr);
      e.has_backoff = true;
    }
    grams_[cur_order - 1][Key(ids.data(), cur_order)] = e;
  }
  auto id_or_neg = [&](const char* w) {
    auto it = word_ids_.find(w);
    return it == word_ids_.end() ? -1 : it->second;
  };
  bos_ = id_or_neg("<s>");
  eos_ = id_or_neg("</s>");
  unk_ = id_or_neg("<unk>");
  return order_ > 0;
}

NgramLm::State NgramLm::BeginState() const {
  State s;
  if (bos_ >= 0) s.push_back(bos_);
  return s;
}

float NgramLm::Score(State* state, int word) const {
  // try longest history first: (h, w) n-gram
  float score = 0.f;
  std::vector<int> ctx = *state;
  // backoff accumulation
  float backoff_sum = 0.f;
  int max_h = order_ - 1;
  if (static_cast<int>(ctx.size()) > max_h)
    ctx.erase(ctx.begin(), ctx.end() - max_h);
  bool found = false;
  for (int h = static_cast<int>(ctx.size()); h >= 0; --h) {
    std::vector<int> ids(ctx.end() - h, ctx.end());
    ids.push_back(word);
    const Entry* e = Find(ids.data(), h + 1);
    if (e != nullptr) {
      score = backoff_sum + e->logp;
      found = true;
      break;
    }
    // accumulate backoff of the h-length history
    if (h > 0) {
      std::vector<int> hist(ctx.end() - h, ctx.end());
      const Entry* b = Find(hist.data(), h);
      if (b != nullptr && b->has_backoff) backoff_sum += b->backoff;
    }
  }
  if (!found) score = backoff_sum - 99.f;  // OOV floor
  state->push_back(word);
  if (static_cast<int>(state->size()) > max_h)
    state->erase(state->begin(), state->end() - max_h);
  return score;
}

float NgramLm::SentenceScore(const std::vector<std::string>& sent) const {
  State s = BeginState();
  float total = 0.f;
  for (const auto& w : sent) total += Score(&s, WordId(w));
  if (eos_ >= 0) total += Score(&s, eos_);
  return total;
}

}  // namespace asr_rt
