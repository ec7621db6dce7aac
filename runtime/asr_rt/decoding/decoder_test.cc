// Runtime decoder tests (coverage parity with reference
// runtime/asr_rt/decoding/fl_decoder_test.cc:1-230): exact n-gram backoff
// arithmetic, trie insert/search/smear, lexicon beam decode in one-shot
// and streaming (DecodeBegin/DecodeStep/Prune/DecodeEnd) modes.

#include <cmath>
#include <cstdio>
#include <fstream>
#include <vector>

#include "asr_rt/decoding/ctc_beam_decoder.h"
#include "asr_rt/decoding/lexicon_trie.h"
#include "asr_rt/decoding/ngram_lm.h"
#include "gtest/gtest.h"

namespace asr_rt {
namespace {

// token ids: 0=<blank>, 1=t, 2=h, 3=e, 4=c, 5=a
constexpr int kBlank = 0, kT = 1, kH = 2, kE = 3, kC = 4, kA = 5;
constexpr int kV = 6;
// NOTE: trie labels must be the LM's word ids (flashlight convention:
// the lexicon maps word → LM index). Resolved after loading the LM.

std::string WriteArpa() {
  std::string path = testing::TempDir() + "/lm.arpa";
  std::ofstream f(path);
  f << "\\data\\\n"
       "ngram 1=6\n"
       "ngram 2=4\n"
       "\n"
       "\\1-grams:\n"
       "-0.5 <s> -0.3\n"
       "-1.0 </s>\n"
       "-0.7 the -0.2\n"
       "-0.9 cat -0.1\n"
       "-1.2 dog -0.1\n"
       "-2.0 <unk>\n"
       "\n"
       "\\2-grams:\n"
       "-0.3 <s> the\n"
       "-0.4 the cat\n"
       "-0.6 the dog\n"
       "-0.8 cat </s>\n"
       "\n"
       "\\end\\\n";
  return path;
}

LexiconTrie BuildTrie(const NgramLm& lm) {
  LexiconTrie trie;
  trie.Insert({kT, kH, kE}, lm.WordId("the"), -0.7f);
  trie.Insert({kC, kA, kT}, lm.WordId("cat"), -0.9f);
  // "dog" shares the c-a prefix to exercise branching: spelling c-a-e
  trie.Insert({kC, kA, kE}, lm.WordId("dog"), -1.2f);
  trie.Smear();
  return trie;
}

// emissions with a strong peak per frame
std::vector<float> Emissions(const std::vector<int>& peaks) {
  std::vector<float> em(peaks.size() * kV, std::log(0.01f));
  for (size_t t = 0; t < peaks.size(); ++t) {
    em[t * kV + peaks[t]] = std::log(0.95f);
  }
  return em;
}

TEST(NgramLm, ExactBackoffArithmetic) {
  NgramLm lm;
  ASSERT_TRUE(lm.LoadArpa(WriteArpa()));
  EXPECT_EQ(lm.order(), 2);

  // existing bigram: p(the | <s>) = -0.3
  auto s = lm.BeginState();
  EXPECT_NEAR(lm.Score(&s, lm.WordId("the")), -0.3f, 1e-5);
  // existing bigram: p(cat | the) = -0.4
  EXPECT_NEAR(lm.Score(&s, lm.WordId("cat")), -0.4f, 1e-5);
  // missing bigram (cat dog): backoff(cat) + unigram(dog) = -0.1 + -1.2
  EXPECT_NEAR(lm.Score(&s, lm.WordId("dog")), -1.3f, 1e-5);
}

TEST(NgramLm, SentenceScore) {
  NgramLm lm;
  ASSERT_TRUE(lm.LoadArpa(WriteArpa()));
  // <s> the (-0.3) + the cat (-0.4) + cat </s> (-0.8)
  EXPECT_NEAR(lm.SentenceScore({"the", "cat"}), -1.5f, 1e-5);
  // OOV: backoff(<s>)=-0.3 + unigram(<unk>)=-2.0, then
  // backoff(<unk>)=0 + unigram(</s>)=-1.0
  EXPECT_NEAR(lm.SentenceScore({"zebra"}), -0.3f - 2.0f - 1.0f, 1e-4);
}

TEST(LexiconTrie, InsertSearchSmear) {
  NgramLm lm;
  ASSERT_TRUE(lm.LoadArpa(WriteArpa()));
  LexiconTrie trie = BuildTrie(lm);
  const TrieNode* the_node = trie.Search({kT, kH, kE});
  ASSERT_NE(the_node, nullptr);
  ASSERT_EQ(the_node->labels.size(), 1u);
  EXPECT_EQ(the_node->labels[0], lm.WordId("the"));

  EXPECT_EQ(trie.Search({kT, kH, kT}), nullptr);

  // smear: prefix "c a" sees max(cat=-0.9, dog=-1.2) = -0.9
  const TrieNode* ca = trie.Search({kC, kA});
  ASSERT_NE(ca, nullptr);
  EXPECT_NEAR(ca->max_score, -0.9f, 1e-5);
  // root smear = best word overall (-0.7)
  EXPECT_NEAR(trie.root()->max_score, -0.7f, 1e-5);
}

TEST(CtcBeamDecoder, OneShotDecodesWords) {
  NgramLm lm;
  ASSERT_TRUE(lm.LoadArpa(WriteArpa()));
  LexiconTrie trie = BuildTrie(lm);
  DecoderOptions opts;
  opts.beam_size = 8;
  CtcBeamDecoder dec(&trie, &lm, opts);

  // t h e <b> c a t  → "the cat" (with a repeated 'e' to test collapse)
  auto em = Emissions({kT, kH, kE, kE, kBlank, kC, kA, kT});
  DecodeResult r = dec.Decode(em.data(), 8, kV);
  ASSERT_EQ(r.words.size(), 2u);
  EXPECT_EQ(r.words[0], lm.WordId("the"));
  EXPECT_EQ(r.words[1], lm.WordId("cat"));
  std::vector<int> want_tokens = {kT, kH, kE, kC, kA, kT};
  EXPECT_EQ(r.tokens, want_tokens);
}

TEST(CtcBeamDecoder, LmBreaksAcousticTie) {
  // shared prefix c-a then ambiguous last token: emission slightly favors
  // neither; LM prefers "the cat" over "the dog" continuation
  NgramLm lm;
  ASSERT_TRUE(lm.LoadArpa(WriteArpa()));
  LexiconTrie trie = BuildTrie(lm);
  DecoderOptions opts;
  opts.beam_size = 16;
  opts.lm_weight = 2.0f;
  CtcBeamDecoder dec(&trie, &lm, opts);

  std::vector<float> em = Emissions({kT, kH, kE, kBlank, kC, kA, kT});
  // make last frame a near-tie between t (→cat) and e (→dog)
  em[6 * kV + kT] = std::log(0.45f);
  em[6 * kV + kE] = std::log(0.45f);
  DecodeResult r = dec.Decode(em.data(), 7, kV);
  ASSERT_EQ(r.words.size(), 2u);
  EXPECT_EQ(r.words[1], lm.WordId("cat"));  // p(cat|the)=-0.4 > p(dog|the)=-0.6
}

TEST(CtcBeamDecoder, StreamingMatchesOneShot) {
  NgramLm lm;
  ASSERT_TRUE(lm.LoadArpa(WriteArpa()));
  LexiconTrie trie = BuildTrie(lm);
  DecoderOptions opts;
  CtcBeamDecoder dec(&trie, &lm, opts);

  auto em = Emissions({kT, kH, kE, kBlank, kC, kA, kT, kBlank});
  DecodeResult oneshot = dec.Decode(em.data(), 8, kV);

  dec.DecodeBegin();
  dec.DecodeStep(em.data(), 3, kV);
  dec.Prune();
  dec.DecodeStep(em.data() + 3 * kV, 5, kV);
  DecodeResult streamed = dec.DecodeEnd();

  EXPECT_EQ(streamed.words, oneshot.words);
  EXPECT_EQ(streamed.tokens, oneshot.tokens);
  EXPECT_NEAR(streamed.score, oneshot.score, 1e-4);
}

}  // namespace
}  // namespace asr_rt
