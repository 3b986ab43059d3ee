// Fast byte-level BPE encoder for pgica_tpu's CaptionTokenizer.
//
// The reference delegates tokenization to HF's Rust tokenizers; this is the
// framework's native equivalent (Rust is unavailable in the build image; C++
// per project convention). Exposed through a C ABI and loaded via ctypes —
// see pgica_tpu/data/native_bpe.py. Semantics mirror the pure-Python
// implementation in pgica_tpu/data/tokenizer.py exactly (pretokenizer,
// byte-to-unicode alphabet, lowest-rank-first merge loop, per-word cache);
// the Python path remains the reference implementation and fallback.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include "unicode_classes.h"

namespace {

// GPT-2's reversible byte -> unicode codepoint map.
struct ByteAlphabet {
    uint32_t to_cp[256];
    ByteAlphabet() {
        bool direct[256] = {false};
        auto mark = [&](int lo, int hi) {
            for (int b = lo; b <= hi; ++b) direct[b] = true;
        };
        mark('!', '~');
        mark(0xA1, 0xAC);
        mark(0xAE, 0xFF);
        uint32_t n = 0;
        for (int b = 0; b < 256; ++b) {
            if (direct[b]) {
                to_cp[b] = static_cast<uint32_t>(b);
            } else {
                to_cp[b] = 256 + n++;
            }
        }
    }
};

const ByteAlphabet kAlphabet;

std::string cp_to_utf8(uint32_t cp) {
    std::string out;
    if (cp < 0x80) {
        out += static_cast<char>(cp);
    } else if (cp < 0x800) {
        out += static_cast<char>(0xC0 | (cp >> 6));
        out += static_cast<char>(0x80 | (cp & 0x3F));
    } else {
        out += static_cast<char>(0xE0 | (cp >> 12));
        out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
        out += static_cast<char>(0x80 | (cp & 0x3F));
    }
    return out;
}

struct PairHash {
    size_t operator()(const std::pair<std::string, std::string>& p) const {
        std::hash<std::string> h;
        return h(p.first) * 1000003u ^ h(p.second);
    }
};

struct BPE {
    std::unordered_map<std::string, int32_t> vocab;
    std::unordered_map<std::pair<std::string, std::string>, int32_t, PairHash> ranks;
    std::unordered_map<std::string, std::vector<int32_t>> cache;
    int32_t unk_id = 0;

    std::vector<int32_t> encode_word(const std::string& word) {
        auto it = cache.find(word);
        if (it != cache.end()) return it->second;

        std::vector<std::string> symbols;
        symbols.reserve(word.size());
        for (unsigned char byte : word) {
            symbols.push_back(cp_to_utf8(kAlphabet.to_cp[byte]));
        }
        while (symbols.size() > 1 && !ranks.empty()) {
            int best_rank = INT32_MAX;
            size_t best_i = 0;
            for (size_t i = 0; i + 1 < symbols.size(); ++i) {
                auto r = ranks.find({symbols[i], symbols[i + 1]});
                if (r != ranks.end() && r->second < best_rank) {
                    best_rank = r->second;
                    best_i = i;
                }
            }
            if (best_rank == INT32_MAX) break;
            // merge ALL adjacent occurrences of the best pair (left to right)
            const std::string first = symbols[best_i];
            const std::string second = symbols[best_i + 1];
            std::vector<std::string> merged;
            merged.reserve(symbols.size());
            for (size_t i = 0; i < symbols.size();) {
                if (i + 1 < symbols.size() && symbols[i] == first && symbols[i + 1] == second) {
                    merged.push_back(first + second);
                    i += 2;
                } else {
                    merged.push_back(symbols[i]);
                    i += 1;
                }
            }
            symbols.swap(merged);
        }
        std::vector<int32_t> ids;
        ids.reserve(symbols.size());
        for (const auto& s : symbols) {
            auto v = vocab.find(s);
            ids.push_back(v != vocab.end() ? v->second : unk_id);
        }
        cache.emplace(word, ids);
        return ids;
    }
};

enum CharClass { kSpace, kAlpha, kDigit, kOther };

// Decode one UTF-8 codepoint starting at text[i]; writes its byte length.
// Invalid sequences decode as the single byte (classified kOther).
uint32_t decode_cp(const char* text, size_t n, size_t i, size_t* len) {
    const unsigned char c0 = static_cast<unsigned char>(text[i]);
    *len = 1;
    if (c0 < 0x80) return c0;
    int extra;
    uint32_t cp;
    if ((c0 & 0xE0) == 0xC0) { extra = 1; cp = c0 & 0x1F; }
    else if ((c0 & 0xF0) == 0xE0) { extra = 2; cp = c0 & 0x0F; }
    else if ((c0 & 0xF8) == 0xF0) { extra = 3; cp = c0 & 0x07; }
    else return 0xFFFD;
    if (i + extra >= n) return 0xFFFD;  // truncated sequence
    for (int k = 1; k <= extra; ++k) {
        const unsigned char cc = static_cast<unsigned char>(text[i + k]);
        if ((cc & 0xC0) != 0x80) return 0xFFFD;
        cp = (cp << 6) | (cc & 0x3F);
    }
    *len = extra + 1;
    return cp;
}

// Exact GPT-2 character classes via the generated Unicode tables
// (native/unicode_classes.h), matching the Python pretokenizer's expanded
// \p{L}/\p{N}/\s classes codepoint for codepoint.
CharClass classify_cp(uint32_t cp) {
    if (uniclass::in_ranges(cp, uniclass::kSpaces, uniclass::kSpacesCount)) return kSpace;
    if (uniclass::in_ranges(cp, uniclass::kLetters, uniclass::kLettersCount)) return kAlpha;
    if (uniclass::in_ranges(cp, uniclass::kNumbers, uniclass::kNumbersCount)) return kDigit;
    return kOther;
}

// Pretokenizer matching tokenizer.py::_PRETOKEN_RE exactly:
//   's|'t|'re|'ve|'m|'ll|'d | ?\p{L}+ | ?\p{N}+ | ?[^\s\p{L}\p{N}]+
//   | \s+(?!\S) | \s+
std::vector<std::string> pretokenize(const char* text) {
    std::vector<std::string> out;
    const size_t n = std::strlen(text);
    size_t i = 0;
    static const char* kContractions[] = {"s", "t", "re", "ve", "m", "ll", "d"};
    while (i < n) {
        // 1. contractions
        if (text[i] == '\'') {
            bool matched = false;
            for (const char* suf : kContractions) {
                const size_t len = std::strlen(suf);
                if (i + 1 + len <= n && std::strncmp(text + i + 1, suf, len) == 0) {
                    out.emplace_back(text + i, len + 1);
                    i += len + 1;
                    matched = true;
                    break;
                }
            }
            if (matched) continue;
        }
        // 2. optional single leading ASCII space + letter/number/punct run
        size_t j = i;
        if (text[j] == ' ') j++;
        if (j < n) {
            size_t cl = 0;
            const CharClass cls = classify_cp(decode_cp(text, n, j, &cl));
            if (cls != kSpace) {
                size_t k = j + cl;
                while (k < n) {
                    size_t cl2 = 0;
                    if (classify_cp(decode_cp(text, n, k, &cl2)) != cls) break;
                    k += cl2;
                }
                out.emplace_back(text + i, k - i);
                i = k;
                continue;
            }
        }
        // 3. whitespace runs: \s+(?!\S) leaves the final whitespace char to
        // prefix the next token (or \s+ consumes a trailing run entirely)
        size_t k = i;
        size_t last_start = i;
        while (k < n) {
            size_t cl = 0;
            if (classify_cp(decode_cp(text, n, k, &cl)) != kSpace) break;
            last_start = k;
            k += cl;
        }
        if (k == n || last_start == i) {
            out.emplace_back(text + i, k - i);
            i = k;
        } else {
            out.emplace_back(text + i, last_start - i);
            i = last_start;
        }
    }
    return out;
}

}  // namespace

extern "C" {

void* bpe_new() { return new BPE(); }

void bpe_free(void* h) { delete static_cast<BPE*>(h); }

void bpe_add_token(void* h, const char* sym, int32_t id) {
    static_cast<BPE*>(h)->vocab[sym] = id;
}

void bpe_add_merge(void* h, const char* a, const char* b, int32_t rank) {
    static_cast<BPE*>(h)->ranks[{a, b}] = rank;
}

void bpe_set_unk(void* h, int32_t id) { static_cast<BPE*>(h)->unk_id = id; }

// Encode `text` into out[0..max_out); returns token count (may exceed max_out
// to signal truncation; only max_out ids are written).
int32_t bpe_encode(void* h, const char* text, int32_t* out, int32_t max_out) {
    BPE* bpe = static_cast<BPE*>(h);
    int32_t count = 0;
    for (const auto& word : pretokenize(text)) {
        for (int32_t id : bpe->encode_word(word)) {
            if (count < max_out) out[count] = id;
            ++count;
        }
    }
    return count;
}

}  // extern "C"
