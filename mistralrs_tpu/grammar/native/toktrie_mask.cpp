// Vocab-mask kernel: product of a DFS-linearized token trie with a dense
// byte DFA. One linear pass over the trie nodes; dead DFA states prune the
// whole subtree via the precomputed subtree_end index.
//
// This is the TPU-framework equivalent of the reference's hot Rust trie walk
// (mistralrs-core/src/aici/toktree.rs add_bias/compute_bias): it runs on the
// host once per constrained decode step, so it must be fast enough to hide
// under the device step dispatch.

#include <cstdint>

extern "C" {

// nodes: byte[i], token[i] (-1 = none), end[i] (subtree end, exclusive)
// dfa:   table[S*256] (row 0 = dead state, self-looping), start state s0
// out:   mask[vocab] (0/1 bytes)
void toktrie_mask(const int32_t* byte, const int32_t* token,
                  const int32_t* end, int32_t n_nodes,
                  const int32_t* table, int32_t s0,
                  uint8_t* mask) {
    // explicit stack of (subtree_end, dfa_state); depth <= max token length
    int32_t stack_end[512];
    int32_t stack_state[512];
    int top = 0;
    stack_end[0] = n_nodes;
    stack_state[0] = s0;
    int32_t i = 0;
    while (i < n_nodes) {
        while (i >= stack_end[top]) top--;
        const int32_t s = table[(int64_t)stack_state[top] * 256 + byte[i]];
        if (s == 0) {  // dead: skip subtree
            i = end[i];
            continue;
        }
        const int32_t t = token[i];
        if (t >= 0) mask[t] = 1;
        if (end[i] > i + 1) {
            ++top;
            stack_end[top] = end[i];
            stack_state[top] = s;
        }
        ++i;
    }
}

// Walk the DFA over a byte string; returns the resulting state (0 = dead).
int32_t dfa_walk(const int32_t* table, int32_t state,
                 const uint8_t* data, int32_t len) {
    for (int32_t i = 0; i < len && state != 0; ++i)
        state = table[(int64_t)state * 256 + data[i]];
    return state;
}

}  // extern "C"
