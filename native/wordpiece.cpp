// Native WordPiece encoder: the hot inner loop of caption tokenization.
//
// The reference tokenizes ~414k COCO captions up-front in Python
// (reference: dataset.py:19-21 via HF's Rust tokenizer); this framework's
// pure-Python fallback is correct but slow at that scale, so the greedy
// longest-match-first WordPiece matching runs here in C++. Unicode-aware
// basic tokenization (lowercasing, accent stripping, punctuation/CJK
// splitting) stays in Python where unicodedata is authoritative; this
// module consumes space-joined pre-split words, guaranteeing bit-identical
// output with the Python path (tests/test_native_tokenizer.py).
//
// C ABI (ctypes-friendly):
//   wp_new(vocab_buf, len)          -> handle (vocab: one token per line)
//   wp_encode_words(h, words, out, cap) -> count (ids of wordpieces)
//   wp_free(h)
//
// Build: make -C native   (produces libwordpiece.so next to this file)

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
  std::unordered_map<std::string, int32_t> table;
  int32_t unk_id = 0;
  int max_chars_per_word = 100;
};

// Greedy longest-match-first wordpiece of one word into `out`.
// Returns the number of pieces appended, or -1 -> caller emits [UNK].
int wordpiece_one(const Vocab& v, const std::string& word,
                  std::vector<int32_t>* out) {
  const size_t n = word.size();
  size_t start = 0;
  int emitted = 0;
  std::string buf;
  while (start < n) {
    size_t end = n;
    int32_t cur = -1;
    while (start < end) {
      buf.assign(start > 0 ? "##" : "");
      buf.append(word, start, end - start);
      auto it = v.table.find(buf);
      if (it != v.table.end()) {
        cur = it->second;
        break;
      }
      // Back off one byte; multi-byte UTF-8 boundaries are safe because a
      // split inside a codepoint can never match a vocab entry (vocab
      // entries are valid UTF-8), so the loop simply keeps shrinking.
      --end;
    }
    if (cur < 0) return -1;
    out->push_back(cur);
    ++emitted;
    start = end;
  }
  return emitted;
}

}  // namespace

extern "C" {

void* wp_new(const char* vocab_buf, int64_t len) {
  auto* v = new Vocab();
  int32_t idx = 0;
  const char* p = vocab_buf;
  const char* end = vocab_buf + len;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    size_t tok_len = (nl ? nl : end) - p;
    v->table.emplace(std::string(p, tok_len), idx++);
    p = nl ? nl + 1 : end;
  }
  auto it = v->table.find("[UNK]");
  v->unk_id = it != v->table.end() ? it->second : 0;
  return v;
}

void wp_free(void* handle) { delete static_cast<Vocab*>(handle); }

// `words`: space-joined pre-split words (output of Python basic_tokenize).
// Writes at most `cap` ids into `out`; returns the total count produced
// (callers pass cap >= expected; extra ids beyond cap are dropped).
int64_t wp_encode_words(void* handle, const char* words, int32_t* out,
                        int64_t cap) {
  const Vocab& v = *static_cast<Vocab*>(handle);
  std::vector<int32_t> ids;
  ids.reserve(64);
  const char* p = words;
  std::string word;
  std::vector<int32_t> pieces;
  while (*p) {
    const char* sp = strchr(p, ' ');
    size_t len = sp ? static_cast<size_t>(sp - p) : strlen(p);
    word.assign(p, len);
    if (!word.empty()) {
      if (static_cast<int>(word.size()) > v.max_chars_per_word) {
        ids.push_back(v.unk_id);
      } else {
        pieces.clear();
        if (wordpiece_one(v, word, &pieces) < 0) {
          ids.push_back(v.unk_id);
        } else {
          ids.insert(ids.end(), pieces.begin(), pieces.end());
        }
      }
    }
    p += len + (sp ? 1 : 0);
  }
  int64_t n = static_cast<int64_t>(ids.size());
  int64_t write = n < cap ? n : cap;
  if (write > 0) memcpy(out, ids.data(), write * sizeof(int32_t));
  return n;
}

}  // extern "C"

namespace {

// ASCII mirrors of Python basic_tokenize's character classes
// (mae_clip_tpu/data/tokenizer.py). Exact for pure-ASCII text: NFD accent
// stripping is the identity on ASCII.
inline bool ascii_is_ws(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r';
}
inline bool ascii_is_control(unsigned char c) {
  return (c < 0x20 && c != '\t' && c != '\n' && c != '\r') || c == 0x7F;
}
inline bool ascii_is_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
         (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

void encode_ascii_text(const Vocab& v, const char* text, size_t len,
                       bool lowercase, std::vector<int32_t>* ids) {
  std::string word;
  std::vector<int32_t> pieces;
  auto flush = [&]() {
    if (word.empty()) return;
    if (static_cast<int>(word.size()) > v.max_chars_per_word) {
      ids->push_back(v.unk_id);
    } else {
      pieces.clear();
      if (wordpiece_one(v, word, &pieces) < 0) {
        ids->push_back(v.unk_id);
      } else {
        ids->insert(ids->end(), pieces.begin(), pieces.end());
      }
    }
    word.clear();
  };
  for (size_t i = 0; i < len; ++i) {
    unsigned char c = static_cast<unsigned char>(text[i]);
    if (c == 0 || ascii_is_control(c)) continue;
    if (ascii_is_ws(c)) {
      flush();
    } else if (ascii_is_punct(c)) {
      flush();
      word.push_back(static_cast<char>(c));
      flush();
    } else {
      word.push_back(lowercase && c >= 'A' && c <= 'Z'
                         ? static_cast<char>(c - 'A' + 'a')
                         : static_cast<char>(c));
    }
  }
  flush();
}

}  // namespace

extern "C" {

// Bulk corpus encode for pure-ASCII texts: one call tokenizes n_texts
// captions. `buf` is the concatenation of all texts; `offsets` has
// n_texts+1 entries delimiting each text. Ids stream into `out` (capacity
// `cap`); `counts[i]` receives text i's id count. Returns total ids
// produced (may exceed cap; caller re-calls with a larger buffer).
int64_t wp_encode_corpus_ascii(void* handle, const char* buf,
                               const int64_t* offsets, int64_t n_texts,
                               int lowercase, int32_t* out, int64_t cap,
                               int32_t* counts) {
  const Vocab& v = *static_cast<Vocab*>(handle);
  std::vector<int32_t> ids;
  ids.reserve(128);
  int64_t total = 0;
  for (int64_t i = 0; i < n_texts; ++i) {
    ids.clear();
    encode_ascii_text(v, buf + offsets[i],
                      static_cast<size_t>(offsets[i + 1] - offsets[i]),
                      lowercase != 0, &ids);
    counts[i] = static_cast<int32_t>(ids.size());
    int64_t n = static_cast<int64_t>(ids.size());
    int64_t room = cap - total;
    int64_t write = n < room ? n : (room > 0 ? room : 0);
    if (write > 0) memcpy(out + total, ids.data(), write * sizeof(int32_t));
    total += n;
  }
  return total;
}

}  // extern "C"
