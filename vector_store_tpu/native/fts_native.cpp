// Native BM25 inverted-index core (C ABI, loaded via ctypes).
//
// The reference embeds tantivy (Rust, SIMD-heavy) for its full-text engine;
// this is the rebuild's native equivalent: analysis chain (simple tokenizer,
// lowercase, English stopwords), staged commits, and BM25 (k1=1.2, b=0.75)
// disjunctive scoring. The Python InvertedIndex in fts/__init__.py is the
// behavior-identical fallback when no C++ toolchain is available.

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

constexpr double K1 = 1.2;
constexpr double B = 0.75;

const std::unordered_set<std::string>& stopwords() {
    static const std::unordered_set<std::string> kStopwords = {
        "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
        "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
        "such", "that", "the", "their", "then", "there", "these", "they",
        "this", "to", "was", "will", "with"};
    return kStopwords;
}

// Simple tokenizer over UTF-8: ASCII alphanumerics lowercase; any multibyte
// sequence counts as word material (mirrors a unicode \w class closely
// enough for the analysis-chain contract).
std::vector<std::string> analyze(const char* text) {
    std::vector<std::string> out;
    std::string cur;
    for (const unsigned char* p = reinterpret_cast<const unsigned char*>(text);
         *p; ++p) {
        unsigned char c = *p;
        if (c < 128) {
            if (std::isalnum(c)) {
                cur.push_back(static_cast<char>(std::tolower(c)));
            } else {
                if (!cur.empty() && !stopwords().count(cur)) out.push_back(cur);
                cur.clear();
            }
        } else {
            cur.push_back(static_cast<char>(c));
        }
    }
    if (!cur.empty() && !stopwords().count(cur)) out.push_back(cur);
    return out;
}

struct Index {
    // committed state
    std::unordered_map<std::string, std::unordered_map<int64_t, int32_t>> postings;
    std::unordered_map<int64_t, int32_t> doc_len;
    int64_t total_len = 0;
    // staged state
    std::unordered_map<int64_t, std::string> pending_add;
    std::unordered_set<int64_t> pending_del;

    void remove_doc(int64_t doc_id) {
        auto it = doc_len.find(doc_id);
        if (it == doc_len.end()) return;
        total_len -= it->second;
        doc_len.erase(it);
        for (auto pit = postings.begin(); pit != postings.end();) {
            pit->second.erase(doc_id);
            if (pit->second.empty()) {
                pit = postings.erase(pit);
            } else {
                ++pit;
            }
        }
    }

    int64_t commit() {
        int64_t n = static_cast<int64_t>(pending_add.size() + pending_del.size());
        for (int64_t doc_id : pending_del) remove_doc(doc_id);
        for (auto& [doc_id, body] : pending_add) {
            remove_doc(doc_id);
            auto tokens = analyze(body.c_str());
            std::unordered_map<std::string, int32_t> tf;
            for (auto& t : tokens) tf[t]++;
            for (auto& [term, count] : tf) postings[term][doc_id] = count;
            doc_len[doc_id] = static_cast<int32_t>(tokens.size());
            total_len += static_cast<int64_t>(tokens.size());
        }
        pending_add.clear();
        pending_del.clear();
        return n;
    }

    int64_t search(const char* query, int32_t limit, int64_t* out_ids,
                   float* out_scores) {
        int64_t n = static_cast<int64_t>(doc_len.size());
        if (n == 0 || limit <= 0) return 0;
        double avg_len = n ? static_cast<double>(total_len) / n : 0.0;
        std::unordered_map<int64_t, double> scores;
        for (auto& term : analyze(query)) {
            auto pit = postings.find(term);
            if (pit == postings.end()) continue;
            double df = static_cast<double>(pit->second.size());
            double idf = std::log(1.0 + (n - df + 0.5) / (df + 0.5));
            for (auto& [doc_id, tf] : pit->second) {
                double dl = doc_len[doc_id];
                double denom =
                    avg_len > 0 ? tf + K1 * (1 - B + B * dl / avg_len) : tf + K1;
                scores[doc_id] += idf * (tf * (K1 + 1)) / denom;
            }
        }
        std::vector<std::pair<int64_t, double>> ranked(scores.begin(),
                                                       scores.end());
        std::sort(ranked.begin(), ranked.end(), [](auto& a, auto& b) {
            if (a.second != b.second) return a.second > b.second;
            return a.first < b.first;
        });
        int64_t count = std::min<int64_t>(limit, ranked.size());
        for (int64_t i = 0; i < count; ++i) {
            out_ids[i] = ranked[i].first;
            out_scores[i] = static_cast<float>(ranked[i].second);
        }
        return count;
    }

    int64_t size_bytes() const {
        int64_t total = 0;
        for (auto& [term, plist] : postings) {
            total += static_cast<int64_t>(term.size()) + 16 * plist.size() + 48;
        }
        total += 16 * static_cast<int64_t>(doc_len.size());
        return total;
    }
};

}  // namespace

extern "C" {

void* fts_create() { return new Index(); }

void fts_destroy(void* h) { delete static_cast<Index*>(h); }

void fts_add_document(void* h, int64_t doc_id, const char* body) {
    auto* idx = static_cast<Index*>(h);
    idx->pending_del.erase(doc_id);
    idx->pending_add[doc_id] = body;
}

void fts_delete_document(void* h, int64_t doc_id) {
    auto* idx = static_cast<Index*>(h);
    idx->pending_add.erase(doc_id);
    idx->pending_del.insert(doc_id);
}

int64_t fts_uncommitted(void* h) {
    auto* idx = static_cast<Index*>(h);
    return static_cast<int64_t>(idx->pending_add.size() + idx->pending_del.size());
}

int64_t fts_commit(void* h) { return static_cast<Index*>(h)->commit(); }

int64_t fts_num_docs(void* h) {
    return static_cast<int64_t>(static_cast<Index*>(h)->doc_len.size());
}

int64_t fts_search(void* h, const char* query, int32_t limit, int64_t* out_ids,
                   float* out_scores) {
    return static_cast<Index*>(h)->search(query, limit, out_ids, out_scores);
}

int64_t fts_size_bytes(void* h) {
    return static_cast<Index*>(h)->size_bytes();
}

}  // extern "C"
