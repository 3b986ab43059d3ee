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

CharClass classify(unsigned char c) {
    if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\v') return kSpace;
    if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c >= 0x80) return kAlpha;
    if (c >= '0' && c <= '9') return kDigit;
    return kOther;
}

// Pretokenizer matching tokenizer.py::_PRETOKEN_RE — GPT-2's pattern with
// every byte >= 0x80 classified as a letter (consistent with the Python
// path's "all non-ASCII codepoints are letters" approximation):
//   's|'t|'re|'ve|'m|'ll|'d | ?letters+ | ?digits+ | ?punct+ |\s+(?!\S)|\s+
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
        // 2. optional single leading space + letter/digit/punct run
        size_t j = i;
        if (text[j] == ' ') j++;
        if (j < n) {
            const CharClass cls = classify(static_cast<unsigned char>(text[j]));
            if (cls != kSpace) {
                size_t k = j + 1;
                while (k < n && classify(static_cast<unsigned char>(text[k])) == cls) k++;
                out.emplace_back(text + i, k - i);
                i = k;
                continue;
            }
        }
        // 3. whitespace runs: \s+(?!\S) leaves the final whitespace char to
        // prefix the next token (or \s+ consumes a trailing run entirely)
        size_t k = i;
        while (k < n && classify(static_cast<unsigned char>(text[k])) == kSpace) k++;
        if (k == n || k - i == 1) {
            out.emplace_back(text + i, k - i);
            i = k;
        } else {
            out.emplace_back(text + i, k - i - 1);
            i = k - 1;
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
