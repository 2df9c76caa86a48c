// tokenizer: native sentence -> token-id encoder for the serving gateway.
//
// The reference tokenizes queries in Python inside its dataset loaders
// (grounding/dataset/charades.py:120-132 replaces every punctuation char
// with a space then lower().split(' '); grounding/dataset/anet.py:92-112
// lowercases, deletes punctuation except ','->space, collapses whitespace)
// and has no online-serving path at all. This library is the text half of
// this framework's serving runtime: it applies exactly those two
// preprocessing rules and an OOV-dropping vocab lookup (reference indexer
// drops unknown words rather than emitting UNK, charades.py:124-125) with
// zero Python in the hot path, so a gateway client can submit raw text and
// the GIL is released for the whole tokenize step.
//
// The vocab is fed in once from Python (the wordtoix npy artifact is a
// pickled dict — parsing pickle in C++ would be madness); after that each
// encode is a byte scan + hash lookups.
//
// Scope note: case-folding is ASCII-only ('A'-'Z'). Python's str.lower()
// also folds non-ASCII letters, but the GloVe vocab and both datasets'
// annotation sentences are ASCII English — tests/test_native_tokenizer.py
// sweeps every bundled annotation sentence and asserts byte-identical ids
// against the Python tokenizer, which is the real-world parity bound.
//
// C ABI (ctypes-friendly):
//   tok_create(&h)                              -> 0
//   tok_load_vocab(h, words_utf8, offsets, ids, n_words)
//       words_utf8: concatenated word bytes; offsets: int64[n_words+1]
//   tok_encode(h, text, mode, out_ids, max_out) -> n_ids (all matched
//       tokens, clamped to max_out in the output buffer) | -1 bad handle
//       mode: 0 = charades, 1 = anet
//   tok_encode_batch(h, texts, offsets, n_texts, mode, out_ids, max_out,
//       out_counts) -> 0 | -1. texts: concatenated utf-8; offsets:
//       int64[n_texts+1]; out_ids: int32[n_texts*max_out] row-major, each
//       row holds the first max_out ids (unwritten slots untouched — pass
//       a zeroed buffer for pad_indices semantics); out_counts[i] = total
//       matched for row i. ONE foreign call per corpus: amortizes FFI
//       overhead that dominates single-sentence encodes.
//   tok_vocab_size(h)                           -> n_words | -1
//   tok_destroy(h)

#include <cstdint>
#include <string>
#include <string_view>
#include <unordered_map>

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int32_t> wordtoix;
};

struct PunctTable {
  bool t[256] = {};
  PunctTable() {  // mirrors Python's string.punctuation (32 ASCII chars)
    const char* p = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~";
    for (const char* q = p; *q; ++q) t[(unsigned char)*q] = true;
  }
};

inline bool is_punct(unsigned char c) {
  static const PunctTable table;  // magic static: thread-safe init
  return table.t[c];
}

inline char ascii_lower(char c) {
  return (c >= 'A' && c <= 'Z') ? (char)(c - 'A' + 'a') : c;
}

// Python str.split() (no arg) whitespace set, ASCII subset.
inline bool is_space(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\v' || c == '\f' ||
         c == '\r';
}

// charades.py:120-121: every punctuation char -> ' ', then
// lower().split(' ') — single-space split; empty fragments fall out as OOV.
void preprocess_charades(std::string_view in, std::string* out) {
  out->clear();
  out->reserve(in.size());
  for (char c : in) {
    out->push_back(is_punct((unsigned char)c) ? ' ' : ascii_lower(c));
  }
}

// anet.py:93-98: lower().strip(); ',' -> ' ', other punctuation deleted;
// '\n' DELETED (replace('\n','') glues its neighbours — it is not a
// separator); whitespace runs collapsed to single spaces (' '.join(split())).
void preprocess_anet(std::string_view in, std::string* out) {
  out->clear();
  out->reserve(in.size());
  // strip() trims Python-whitespace from both ends first; since the
  // collapse below also eats leading/trailing runs, a plain scan suffices.
  bool pending_space = false;
  for (char c0 : in) {
    char c = ascii_lower(c0);
    if (c == '\n') continue;  // replace('\n','') — glue, not separator
    if (is_punct((unsigned char)c)) {
      if (c == ',') pending_space = true;  // comma becomes a separator
      continue;                            // other punctuation deleted
    }
    if (is_space((unsigned char)c)) {
      pending_space = true;
      continue;
    }
    if (pending_space && !out->empty()) out->push_back(' ');
    pending_space = false;
    out->push_back(c);
  }
}

}  // namespace

extern "C" {

int tok_create(void** out) {
  *out = new Tokenizer();
  return 0;
}

int tok_load_vocab(void* h, const char* words_utf8, const int64_t* offsets,
                   const int32_t* ids, int64_t n_words) {
  if (h == nullptr) return -1;
  auto* t = static_cast<Tokenizer*>(h);
  t->wordtoix.reserve((size_t)n_words * 2);
  for (int64_t i = 0; i < n_words; ++i) {
    t->wordtoix.emplace(
        std::string(words_utf8 + offsets[i],
                    (size_t)(offsets[i + 1] - offsets[i])),
        ids[i]);
  }
  return 0;
}

int64_t tok_vocab_size(void* h) {
  if (h == nullptr) return -1;
  return (int64_t)static_cast<Tokenizer*>(h)->wordtoix.size();
}

namespace {

// Core encode: preprocess into buf, split on ' ', look up each fragment.
// Returns total matched; writes at most max_out ids.
int64_t encode_one(const Tokenizer& t, std::string_view in, int32_t mode,
                   int32_t* out_ids, int64_t max_out, std::string* buf,
                   std::string* word) {
  if (mode == 0) {
    preprocess_charades(in, buf);
  } else {
    preprocess_anet(in, buf);
  }
  int64_t n = 0;
  size_t start = 0;
  const size_t len = buf->size();
  while (start <= len) {
    size_t end = buf->find(' ', start);
    if (end == std::string::npos) end = len;
    if (end > start) {  // empty fragments are never in the vocab
      word->assign(*buf, start, end - start);
      auto it = t.wordtoix.find(*word);
      if (it != t.wordtoix.end()) {
        if (n < max_out) out_ids[n] = it->second;
        ++n;
      }
    }
    if (end == len) break;
    start = end + 1;
  }
  return n;
}

}  // namespace

// Returns the number of in-vocab tokens found (may exceed max_out; only the
// first max_out are written — the caller uses the count to detect overflow).
int64_t tok_encode(void* h, const char* text, int32_t mode, int32_t* out_ids,
                   int64_t max_out) {
  if (h == nullptr || text == nullptr) return -1;
  auto* t = static_cast<Tokenizer*>(h);
  thread_local std::string buf, word;
  return encode_one(*t, std::string_view(text), mode, out_ids, max_out,
                    &buf, &word);
}

int tok_encode_batch(void* h, const char* texts, const int64_t* offsets,
                     int64_t n_texts, int32_t mode, int32_t* out_ids,
                     int64_t max_out, int32_t* out_counts) {
  if (h == nullptr || texts == nullptr) return -1;
  auto* t = static_cast<Tokenizer*>(h);
  std::string buf, word;
  for (int64_t i = 0; i < n_texts; ++i) {
    std::string_view in(texts + offsets[i],
                        (size_t)(offsets[i + 1] - offsets[i]));
    out_counts[i] = (int32_t)encode_one(*t, in, mode,
                                        out_ids + i * max_out, max_out,
                                        &buf, &word);
  }
  return 0;
}

int tok_destroy(void* h) {
  delete static_cast<Tokenizer*>(h);
  return 0;
}

}  // extern "C"
