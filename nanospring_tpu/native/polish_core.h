// Shared polish core: consensus column-vote substitution + indel rewrite,
// per contig. Defined in polish.cpp (which also wraps them in the
// ns_polish_batch C ABI for the Python path and its bit-parity tests);
// consumed directly by engine.cpp so the engine can polish its own
// contigs in place — no flatten/fetch round trip through Python.
//
// Reference role: the weighted main-path recompute of
// src/ConsensusGraph.cpp:559-615 (calculateMainPathGreedy).
#pragma once

#include <cstdint>
#include <vector>

namespace nsp {

struct Member {
    std::vector<uint8_t> ops;
    int64_t tstart;                 // relative to contig cons[0]
    int64_t tend = 0;               // set by the subs vote scan
    const uint8_t* codes;           // oriented query codes
};

// one pass each; mutate cons + member ops/tstart in place
void polish_subs(std::vector<uint8_t>& cons, std::vector<Member>& ms);
void polish_indels(std::vector<uint8_t>& cons, std::vector<Member>& ms);

}  // namespace nsp
