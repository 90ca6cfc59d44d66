// Native tree-construction kernels.
//
// The reference implements its tree/metadata machinery in Fortran
// (src/m_build_tree.f90, src/m_load_balance.f90); here the per-box hot
// loops — bulk child creation, neighbor wiring through the parent walk,
// refinement-boundary scans, and Morton-chunk load balancing — are C++,
// driven from the Python orchestration in core/tree.py (which also has a
// pure-NumPy fallback).  Exposed via a plain C ABI for ctypes.
//
// Conventions match core/tree.py: ids 0-based, NO_BOX=-1,
// PHYS_BOUNDARY=-2, ix 1-based, child bit d = offset along dim d,
// neighbor nb = 2*d + (0 low / 1 high).

#include <cstdint>
#include <cstring>

namespace {

constexpr int64_t NO_BOX = -1;

inline int num_children(int ndim) { return 1 << ndim; }
inline int num_neighbors(int ndim) { return 2 * ndim; }

inline int ix_to_ichild(const int64_t* ix, int ndim) {
  int c = 0;
  for (int d = 0; d < ndim; ++d) c |= static_cast<int>((ix[d] - 1) & 1) << d;
  return c;
}

struct Boxes {
  int ndim;
  int64_t* ix;         // [cap, ndim]
  int64_t* lvl;        // [cap]
  int64_t* parent;     // [cap]
  int64_t* children;   // [cap, 2^ndim]
  int64_t* neighbors;  // [cap, 2*ndim]
  int64_t* rank;       // [cap]
};

// Find the same-level neighbor of `id` in direction nb through the parent
// (m_build_tree.f90:236-255).  Returns a sentinel (<= NO_BOX) when the
// neighbor does not exist at this level.
int64_t find_neighb(const Boxes& b, int64_t id, int nb) {
  const int D = b.ndim;
  const int nch = num_children(D);
  int64_t p_id = b.parent[id];
  const int c_ix = ix_to_ichild(&b.ix[id * D], D);
  const int d = nb / 2;
  const bool nb_low = (nb % 2) == 0;
  const bool child_low = ((c_ix >> d) & 1) == 0;
  if (child_low == nb_low) {
    p_id = b.neighbors[p_id * num_neighbors(D) + nb];
    if (p_id <= NO_BOX) return p_id;
  }
  return b.children[p_id * nch + (c_ix ^ (1 << d))];
}

}  // namespace

extern "C" {

// Create 2^D children for each parent id, in order.  Returns the new box
// count.  Caller guarantees capacity (mg_add_children,
// m_build_tree.f90:330-367).
int64_t omg_add_children_bulk(int ndim, int64_t n_boxes,
                              const int64_t* parent_ids, int64_t n_parents,
                              int64_t* ix, int64_t* lvl, int64_t* parent,
                              int64_t* children, int64_t* neighbors,
                              int64_t* rank) {
  const int nch = num_children(ndim);
  const int nnb = num_neighbors(ndim);
  Boxes b{ndim, ix, lvl, parent, children, neighbors, rank};
  for (int64_t i = 0; i < n_parents; ++i) {
    const int64_t id = parent_ids[i];
    const int64_t base = n_boxes;
    n_boxes += nch;
    for (int c = 0; c < nch; ++c) {
      const int64_t cid = base + c;
      children[id * nch + c] = cid;
      rank[cid] = rank[id];
      lvl[cid] = lvl[id] + 1;
      parent[cid] = id;
      for (int d = 0; d < ndim; ++d)
        ix[cid * ndim + d] = 2 * ix[id * ndim + d] - 1 + ((c >> d) & 1);
      for (int c2 = 0; c2 < nch; ++c2) children[cid * nch + c2] = NO_BOX;
      for (int nb = 0; nb < nnb; ++nb) neighbors[cid * nnb + nb] = NO_BOX;
    }
    // children inherit exterior (physical) boundaries on outward faces
    for (int nb = 0; nb < nnb; ++nb) {
      const int64_t pnb = neighbors[id * nnb + nb];
      if (pnb < NO_BOX) {
        const int d = nb / 2, high = nb % 2;
        for (int c = 0; c < nch; ++c)
          if (((c >> d) & 1) == high) neighbors[(base + c) * nnb + nb] = pnb;
      }
    }
  }
  return n_boxes;
}

// Wire same-level neighbors for all level ids (set_neighbs,
// m_build_tree.f90:219-233).
void omg_set_neighbors_lvl(int ndim, const int64_t* ids, int64_t n,
                           int64_t* ix, int64_t* lvl, int64_t* parent,
                           int64_t* children, int64_t* neighbors,
                           int64_t* rank) {
  const int nnb = num_neighbors(ndim);
  Boxes b{ndim, ix, lvl, parent, children, neighbors, rank};
  for (int64_t i = 0; i < n; ++i) {
    const int64_t id = ids[i];
    for (int nb = 0; nb < nnb; ++nb) {
      if (neighbors[id * nnb + nb] == NO_BOX) {
        const int64_t nb_id = find_neighb(b, id, nb);
        if (nb_id > NO_BOX) {
          neighbors[id * nnb + nb] = nb_id;
          neighbors[nb_id * nnb + (nb ^ 1)] = id;
        }
      }
    }
  }
}

// Collect leaves adjacent to a refined same-level neighbor
// (mg_set_refinement_boundaries, m_build_tree.f90:296-328).  Returns count.
int64_t omg_ref_bnds(int ndim, const int64_t* leaves, int64_t n_leaves,
                     const int64_t* children, const int64_t* neighbors,
                     int64_t* out) {
  const int nch = num_children(ndim);
  const int nnb = num_neighbors(ndim);
  int64_t k = 0;
  for (int64_t i = 0; i < n_leaves; ++i) {
    const int64_t id = leaves[i];
    for (int nb = 0; nb < nnb; ++nb) {
      const int64_t nb_id = neighbors[id * nnb + nb];
      if (nb_id > NO_BOX && children[nb_id * nch] != NO_BOX) {
        out[k++] = id;
        break;
      }
    }
  }
  return k;
}

// Equal-chunk Morton load balance of one level's id list across n_ranks
// (mg_load_balance_simple, m_load_balance.f90:38-56).
void omg_balance_simple(const int64_t* ids, int64_t n, int64_t n_ranks,
                        int64_t* rank_out) {
  int64_t work_left = n, my_work = 0, i_cpu = 0;
  for (int64_t i = 0; i < n; ++i) {
    if ((n_ranks - i_cpu - 1) * my_work >= work_left) {
      ++i_cpu;
      my_work = 0;
    }
    ++my_work;
    --work_left;
    rank_out[ids[i]] = i_cpu;
  }
}

int omg_abi_version() { return 1; }

}  // extern "C"
