// Lexicon trie over acoustic tokens spelling words, with max-score
// smearing (capability parity with the flashlight-text Trie the reference
// gtest exercises: insert/search/smear, fl_decoder_test.cc:97-157).
#pragma once

#include <memory>
#include <string>
#include <unordered_map>
#include <vector>

namespace asr_rt {

struct TrieNode {
  std::unordered_map<int, std::unique_ptr<TrieNode>> children;
  // words (lexicon entries) terminating at this node + their LM scores
  std::vector<int> labels;
  std::vector<float> scores;
  // smeared score: max over this subtree's completion scores
  float max_score = -1e9f;

  TrieNode* Child(int token) const {
    auto it = children.find(token);
    return it == children.end() ? nullptr : it->second.get();
  }
};

class LexiconTrie {
 public:
  LexiconTrie() : root_(new TrieNode()) {}

  // Insert a word spelled as token ids, with its (unigram) LM score.
  void Insert(const std::vector<int>& spelling, int word_id, float score);
  const TrieNode* Search(const std::vector<int>& spelling) const;
  // Propagate max completion score up the trie (logadd=false → max smear).
  void Smear();
  const TrieNode* root() const { return root_.get(); }

 private:
  static float SmearNode(TrieNode* node);
  std::unique_ptr<TrieNode> root_;
};

}  // namespace asr_rt
