// Golden-sketch generator: calls the REFERENCE's own generateHashes_b,
// SpookyHash::Hash64 and computeSim (compiled from /root/reference/src) with
// a faithful k<32 per-document window loop (semantics of
// src/MinhashSketch.cu:48-103 / src/main.cu:94-150, no chunking).
#include <cstdio>
#include <cstdint>
#include <string>
#include <vector>
#include <set>
#include <fstream>
#include "Hash.h"

static std::string read_fasta(const char* path) {
    std::ifstream f(path);
    std::string info, seq, s;
    std::getline(f, info);
    while (std::getline(f, s)) if (!s.empty()) seq += s;
    return seq;
}

static int b2i(char c){ return c=='A'?0 : c=='C'?1 : c=='G'?2 : c=='T'?3 : -1; }

// per-document signature, intended genSig semantics, k<32
static signature sig_of(const std::string& seq, int k, int m, int t, uint64* bs) {
    signature sig(t, std::vector<uint64>(m, UINT64_MAX));
    for (int j = 0; j < t; ++j) {
        std::set<uint64> acc;  // keeps all distinct; bottom-m taken after
        uint64 cur = 0;
        uint64 mod = (uint64)1 << (2 * k);
        for (size_t i = 0; i < seq.size(); ++i) {
            int c = b2i(seq[i]);
            if (c != -1) cur = (cur << 2) % mod + c;
            if (i >= (size_t)(k - 1))
                acc.insert(SpookyHash::Hash64(&cur, (k/32+1)*8, bs[j]));
        }
        int idx = 0;
        for (auto it = acc.begin(); it != acc.end() && idx < m; ++it)
            sig[j][idx++] = *it;
    }
    return sig;
}

static void dump(const char* name, const signature& s) {
    printf("\"%s\": [", name);
    for (size_t j = 0; j < s.size(); ++j) {
        printf("[");
        for (size_t i = 0; i < s[j].size(); ++i)
            printf("%llu%s", (unsigned long long)s[j][i], i+1<s[j].size()?",":"");
        printf("]%s", j+1<s.size()?",":"");
    }
    printf("]");
}

int main() {
    std::string clip1 = read_fasta("/root/reference/testing_files/sequence_clip1.fasta");
    std::string clip2 = read_fasta("/root/reference/testing_files/sequence_clip2.fasta");
    std::string clip3 = read_fasta("/root/reference/testing_files/sequence_clip3.fasta");
    printf("{\n\"clip_lens\": [%zu,%zu,%zu],\n", clip1.size(), clip2.size(), clip3.size());
    // documented quick config (src/README.md:5-9): k=5 m=10 t=10; fixed seed 123
    {
        uint64* bs = generateHashes_b(10, 123);
        printf("\"hashes_b_t10_s123\": [");
        for (int i = 0; i < 10; i++) printf("%llu%s", (unsigned long long)bs[i], i<9?",":"");
        printf("],\n");
        signature s1 = sig_of(clip1, 5, 10, 10, bs);
        signature s2 = sig_of(clip2, 5, 10, 10, bs);
        signature s3 = sig_of(clip3, 5, 10, 10, bs);
        dump("sig_clip1_k5", s1); printf(",\n");
        dump("sig_clip2_k5", s2); printf(",\n");
        dump("sig_clip3_k5", s3); printf(",\n");
        printf("\"sim_clip12_k5\": %.17g,\n", computeSim(s1, s2));
        printf("\"sim_clip13_k5\": %.17g,\n", computeSim(s1, s3));
        printf("\"sim_clip11_k5\": %.17g,\n", computeSim(s1, s1));
    }
    // screenshot config on the clips (k=31 m=9 t=5 seed=540484695)
    {
        uint64* bs = generateHashes_b(5, 540484695);
        printf("\"hashes_b_t5_s540484695\": [");
        for (int i = 0; i < 5; i++) printf("%llu%s", (unsigned long long)bs[i], i<4?",":"");
        printf("],\n");
        signature s1 = sig_of(clip1, 31, 9, 5, bs);
        signature s2 = sig_of(clip2, 31, 9, 5, bs);
        dump("sig_clip1_k31", s1); printf(",\n");
        dump("sig_clip2_k31", s2); printf(",\n");
        printf("\"sim_clip12_k31\": %.17g,\n", computeSim(s1, s2));
        // padding quirk Q2: tiny doc with < m distinct k-mers
        std::string tiny = "ACGTACGTAC";
        signature st1 = sig_of(tiny, 5, 10, 10, generateHashes_b(10, 123));
        dump("sig_tiny_k5", st1); printf(",\n");
        printf("\"sim_tiny_self\": %.17g\n", computeSim(st1, st1));
    }
    printf("}\n");
    return 0;
}
