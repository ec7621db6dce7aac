#include "asr_rt/decoding/lexicon_trie.h"

#include <algorithm>

namespace asr_rt {

void LexiconTrie::Insert(const std::vector<int>& spelling, int word_id,
                         float score) {
  TrieNode* node = root_.get();
  for (int tok : spelling) {
    auto& child = node->children[tok];
    if (!child) child.reset(new TrieNode());
    node = child.get();
  }
  node->labels.push_back(word_id);
  node->scores.push_back(score);
}

const TrieNode* LexiconTrie::Search(const std::vector<int>& spelling) const {
  const TrieNode* node = root_.get();
  for (int tok : spelling) {
    node = node->Child(tok);
    if (node == nullptr) return nullptr;
  }
  return node;
}

float LexiconTrie::SmearNode(TrieNode* node) {
  float best = -1e9f;
  for (float s : node->scores) best = std::max(best, s);
  for (auto& kv : node->children) best = std::max(best, SmearNode(kv.second.get()));
  node->max_score = best;
  return best;
}

void LexiconTrie::Smear() { SmearNode(root_.get()); }

}  // namespace asr_rt
