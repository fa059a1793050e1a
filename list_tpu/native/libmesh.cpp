// list_tpu native library: host-side geometry kernels.
//
// TPU-native rebuild of the reference's native layer:
//  - inside_mesh / triangle hash: replaces the Cython TriangleHash +
//    numpy MeshIntersector pipeline (reference: evaluation/libmesh/
//    triangle_hash.pyx:9-87, evaluation/libmesh/inside_mesh.py:11-155) with
//    a single C++ pass (same algorithm: rescale to [0.5,res-0.5]^3, 2D
//    spatial hash over xy, barycentric containment, z-parity in both
//    directions).
//  - isosurface extraction: replaces PyMCubes marching_cubes
//    (reference: utils.py:172-182).  Implemented as table-free marching
//    tetrahedra over the Kuhn 6-tet cube subdivision (watertight, vertices
//    deduplicated on shared edges).
//  - kdtree_nn: nearest-neighbour distances (replaces scipy cKDTree use in
//    evaluation/eval_util.py:144-158).
//  - signed_distance: BVH point-triangle distance + inside/outside sign via
//    the same parity test (replaces igl.signed_distance in
//    preprocessing/preprocess.py:68).
//
// All entry points are one-shot C ABI functions operating on caller-owned
// numpy buffers; variable-size outputs are malloc'd here and released with
// lm_free.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

// Per-point query loops (ray-stab containment, KD-tree NN, BVH distance)
// are embarrassingly parallel: disjoint output slots, read-only shared
// structures.  The reference's Cython/scipy equivalents are single-threaded
// (evaluation/libmesh/triangle_hash.pyx, eval_util.py:144-158) and host
// eval was measured 10-30x the device decode time per shape (VERDICT r3);
// chunk the loop over std::thread workers.  LIST_TPU_NATIVE_THREADS
// overrides the worker count (0/1 = serial).
int num_threads() {
  if (const char* env = std::getenv("LIST_TPU_NATIVE_THREADS")) {
    int n = std::atoi(env);
    if (n >= 1) return n;
  }
  unsigned hw = std::thread::hardware_concurrency();
  return hw ? (int)hw : 1;
}

template <typename Fn>
void parallel_for(int64_t n, Fn&& fn) {
  int nt = num_threads();
  if (nt <= 1 || n < 4096) {  // below ~4k points threading overhead loses
    fn((int64_t)0, n);
    return;
  }
  nt = (int)std::min<int64_t>(nt, (n + 4095) / 4096);
  std::vector<std::thread> workers;
  workers.reserve(nt);
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    workers.emplace_back([&fn, lo, hi] { fn(lo, hi); });
  }
  for (auto& w : workers) w.join();
}

}  // namespace

extern "C" {

void lm_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// inside_mesh: parity ray-stabbing with a 2D spatial hash.
// ---------------------------------------------------------------------------

void inside_mesh(const double* tri, int64_t n_tri, const double* pts,
                 int64_t n_pts, int resolution, uint8_t* contains,
                 uint8_t* holes) {
  std::memset(contains, 0, n_pts);
  std::memset(holes, 0, n_pts);
  if (n_tri == 0 || n_pts == 0) return;

  // Bounding box over triangle vertices.
  double bmin[3] = {1e300, 1e300, 1e300}, bmax[3] = {-1e300, -1e300, -1e300};
  for (int64_t t = 0; t < n_tri; ++t)
    for (int v = 0; v < 3; ++v)
      for (int d = 0; d < 3; ++d) {
        double x = tri[(t * 3 + v) * 3 + d];
        bmin[d] = std::min(bmin[d], x);
        bmax[d] = std::max(bmax[d], x);
      }
  // scale/translate to [0.5, res-0.5]^3 (inside_mesh.py:19-21)
  double scale[3], trans[3];
  for (int d = 0; d < 3; ++d) {
    double ext = bmax[d] - bmin[d];
    scale[d] = (resolution - 1) / (ext != 0.0 ? ext : 1.0);
    trans[d] = 0.5 - scale[d] * bmin[d];
  }

  std::vector<double> T(n_tri * 9);
  for (int64_t t = 0; t < n_tri; ++t)
    for (int v = 0; v < 3; ++v)
      for (int d = 0; d < 3; ++d)
        T[(t * 3 + v) * 3 + d] = scale[d] * tri[(t * 3 + v) * 3 + d] + trans[d];

  // 2D spatial hash: push each triangle into every cell its xy-bbox covers
  // (triangle_hash.pyx:31-47; <int> cast truncates, then clamps).
  std::vector<std::vector<int32_t>> hash(
      (size_t)resolution * (size_t)resolution);
  for (int64_t t = 0; t < n_tri; ++t) {
    int lo[2], hi[2];
    for (int j = 0; j < 2; ++j) {
      double mn = std::min({T[(t * 3 + 0) * 3 + j], T[(t * 3 + 1) * 3 + j],
                            T[(t * 3 + 2) * 3 + j]});
      double mx = std::max({T[(t * 3 + 0) * 3 + j], T[(t * 3 + 1) * 3 + j],
                            T[(t * 3 + 2) * 3 + j]});
      lo[j] = std::min(std::max((int)mn, 0), resolution - 1);
      hi[j] = std::min(std::max((int)mx, 0), resolution - 1);
    }
    for (int x = lo[0]; x <= hi[0]; ++x)
      for (int y = lo[1]; y <= hi[1]; ++y)
        hash[(size_t)resolution * x + y].push_back((int32_t)t);
  }

  // --- per-cell hoisted triangle constants (r5, VERDICT r4 #7) ------------
  // The r4 loop recomputed the 2D containment matrix (6 vertex diffs, a
  // determinant, a sign fold) for every (point, triangle) pair; with ~15
  // points and ~10 candidate triangles per cell that is the whole inner-
  // loop cost.  Precompute per cell entry, in CSR layout, the sign-folded
  // coefficients — multiplying by s = +-1 is IEEE-exact, so u/v below are
  // BITWISE identical to the old ``(a11*y0 - a01*y1) * s`` form.  The
  // depth branch (only for 2D-contained pairs — a tiny fraction) keeps
  // the original arithmetic verbatim for bit parity.
  const size_t n_cells = (size_t)resolution * (size_t)resolution;
  std::vector<int64_t> cell_off(n_cells + 1, 0);
  for (size_t c = 0; c < n_cells; ++c)
    cell_off[c + 1] = cell_off[c] + (int64_t)hash[c].size();
  const int64_t n_ent = cell_off[n_cells];
  std::vector<double> e_c(n_ent * 7);  // sa11, sa01, sa10, sa00, ad, t3x, t3y
  std::vector<int32_t> e_tri(n_ent);
  for (size_t c = 0; c < n_cells; ++c) {
    int64_t e = cell_off[c];
    for (int32_t t : hash[c]) {
      const double* t1 = &T[(t * 3 + 0) * 3];
      const double* t2 = &T[(t * 3 + 1) * 3];
      const double* t3 = &T[(t * 3 + 2) * 3];
      double a00 = t1[0] - t3[0], a01 = t2[0] - t3[0];
      double a10 = t1[1] - t3[1], a11 = t2[1] - t3[1];
      double detA = a00 * a11 - a01 * a10;
      double* ec = &e_c[e * 7];
      if (detA == 0.0) {
        // degenerate: all-zero coefficients make u = v = 0 fail the
        // strict u > 0 test, matching the old ``continue``
        for (int k = 0; k < 5; ++k) ec[k] = 0.0;
        ec[5] = t3[0]; ec[6] = t3[1];
      } else {
        double s = detA > 0 ? 1.0 : -1.0;
        ec[0] = s * a11; ec[1] = s * a01; ec[2] = s * a10; ec[3] = s * a00;
        ec[4] = std::fabs(detA); ec[5] = t3[0]; ec[6] = t3[1];
      }
      e_tri[e] = t;
      ++e;
    }
  }

  // --- bucket points by cell so each cell's triangle constants are ------
  // fetched once and the containment test runs as a flat vectorizable
  // loop over the cell's points (SoA chunks).
  std::vector<double> P((size_t)n_pts * 3);
  std::vector<int64_t> pcell(n_pts);
  for (int64_t i = 0; i < n_pts; ++i) {
    bool in_aabb = true;
    double p[3];
    for (int d = 0; d < 3; ++d) {
      p[d] = scale[d] * pts[i * 3 + d] + trans[d];
      // cull outside [0, res] (inside_mesh.py:41-42)
      if (!(p[d] >= 0.0 && p[d] <= resolution)) in_aabb = false;
    }
    P[i * 3 + 0] = p[0]; P[i * 3 + 1] = p[1]; P[i * 3 + 2] = p[2];
    int cx = (int)p[0], cy = (int)p[1];
    if (!in_aabb || cx < 0 || cx >= resolution || cy < 0 ||
        cy >= resolution) {
      pcell[i] = -1;
      continue;
    }
    pcell[i] = (int64_t)resolution * cx + cy;
  }
  std::vector<int64_t> poff(n_cells + 1, 0);
  for (int64_t i = 0; i < n_pts; ++i)
    if (pcell[i] >= 0) ++poff[(size_t)pcell[i] + 1];
  for (size_t c = 0; c < n_cells; ++c) poff[c + 1] += poff[c];
  std::vector<int64_t> order(poff[n_cells]);
  {
    std::vector<int64_t> cur(poff.begin(), poff.end() - 1);
    for (int64_t i = 0; i < n_pts; ++i)
      if (pcell[i] >= 0) order[cur[(size_t)pcell[i]]++] = i;
  }

  parallel_for((int64_t)n_cells, [&](int64_t c_lo, int64_t c_hi) {
    constexpr int CHUNK = 128;
    double px[CHUNK], py[CHUNK], pz[CHUNK];
    int64_t pid[CHUNK];
    uint32_t cn0[CHUNK], cn1[CHUNK];
    uint8_t pass[CHUNK];
    for (int64_t c = c_lo; c < c_hi; ++c) {
      int64_t pb = poff[c], pe = poff[c + 1];
      if (pb == pe) continue;
      int64_t tb = cell_off[c], te = cell_off[c + 1];
      for (int64_t g0 = pb; g0 < pe; g0 += CHUNK) {
        int M = (int)std::min<int64_t>(CHUNK, pe - g0);
        for (int m = 0; m < M; ++m) {
          int64_t i = order[g0 + m];
          pid[m] = i;
          px[m] = P[i * 3 + 0]; py[m] = P[i * 3 + 1]; pz[m] = P[i * 3 + 2];
          cn0[m] = 0; cn1[m] = 0;
        }
        for (int64_t e = tb; e < te; ++e) {
          const double* ec = &e_c[e * 7];
          const double sa11 = ec[0], sa01 = ec[1], sa10 = ec[2],
                       sa00 = ec[3], ad = ec[4], t3x = ec[5], t3y = ec[6];
          int any = 0;
          for (int m = 0; m < M; ++m) {  // vector phase: containment only
            double y0 = px[m] - t3x, y1 = py[m] - t3y;
            double u = sa11 * y0 - sa01 * y1;
            double v = -(sa10 * y0) + sa00 * y1;
            double uv = u + v;
            uint8_t ok = (uint8_t)(u > 0 && u < ad && v > 0 && v < ad &&
                                   uv > 0 && uv < ad);
            pass[m] = ok;
            any |= ok;
          }
          if (!any) continue;
          // scalar phase (rare): original depth math, verbatim
          int32_t t = e_tri[e];
          const double* t1 = &T[(t * 3 + 0) * 3];
          const double* t2 = &T[(t * 3 + 1) * 3];
          const double* t3 = &T[(t * 3 + 2) * 3];
          double v1x = t3[0] - t1[0], v1y = t3[1] - t1[1],
                 v1z = t3[2] - t1[2];
          double v2x = t2[0] - t1[0], v2y = t2[1] - t1[1],
                 v2z = t2[2] - t1[2];
          double nx = v1y * v2z - v1z * v2y;
          double ny = v1z * v2x - v1x * v2z;
          double nz = v1x * v2y - v1y * v2x;
          double abs_n2 = std::fabs(nz);
          if (abs_n2 == 0.0) continue;  // nan depth: contributes nothing
          double s_n2 = nz > 0 ? 1.0 : -1.0;
          for (int m = 0; m < M; ++m) {
            if (!pass[m]) continue;
            double alpha = nx * (t1[0] - px[m]) + ny * (t1[1] - py[m]);
            double depth = t1[2] * abs_n2 + alpha * s_n2;
            if (depth >= pz[m] * abs_n2)
              ++cn0[m];
            else
              ++cn1[m];
          }
        }
        for (int m = 0; m < M; ++m) {
          bool c1 = (cn0[m] % 2) == 1, c2 = (cn1[m] % 2) == 1;
          contains[pid[m]] = (uint8_t)(c1 && c2);
          holes[pid[m]] = (uint8_t)(c1 != c2);
        }
      }
    }
  });
}

// ---------------------------------------------------------------------------
// Triangle hash with persistent handle (API parity with the reference's
// TriangleHash class: build once, query many).
// ---------------------------------------------------------------------------

struct TriHash {
  int resolution;
  std::vector<std::vector<int32_t>> cells;
};

void* triangle_hash_build(const double* tri2d, int64_t n_tri, int resolution) {
  auto* h = new TriHash;
  h->resolution = resolution;
  h->cells.resize((size_t)resolution * resolution);
  for (int64_t t = 0; t < n_tri; ++t) {
    int lo[2], hi[2];
    for (int j = 0; j < 2; ++j) {
      double mn = std::min({tri2d[(t * 3 + 0) * 2 + j],
                            tri2d[(t * 3 + 1) * 2 + j],
                            tri2d[(t * 3 + 2) * 2 + j]});
      double mx = std::max({tri2d[(t * 3 + 0) * 2 + j],
                            tri2d[(t * 3 + 1) * 2 + j],
                            tri2d[(t * 3 + 2) * 2 + j]});
      lo[j] = std::min(std::max((int)mn, 0), resolution - 1);
      hi[j] = std::min(std::max((int)mx, 0), resolution - 1);
    }
    for (int x = lo[0]; x <= hi[0]; ++x)
      for (int y = lo[1]; y <= hi[1]; ++y)
        h->cells[(size_t)resolution * x + y].push_back((int32_t)t);
  }
  return h;
}

int64_t triangle_hash_query(void* handle, const double* pts, int64_t n_pts,
                            int32_t** point_idx_out, int32_t** tri_idx_out) {
  auto* h = (TriHash*)handle;
  std::vector<int32_t> pi, ti;
  for (int64_t i = 0; i < n_pts; ++i) {
    int x = (int)pts[i * 2 + 0], y = (int)pts[i * 2 + 1];
    if (x < 0 || x >= h->resolution || y < 0 || y >= h->resolution) continue;
    for (int32_t t : h->cells[(size_t)h->resolution * x + y]) {
      pi.push_back((int32_t)i);
      ti.push_back(t);
    }
  }
  *point_idx_out = (int32_t*)malloc(pi.size() * sizeof(int32_t));
  *tri_idx_out = (int32_t*)malloc(ti.size() * sizeof(int32_t));
  std::memcpy(*point_idx_out, pi.data(), pi.size() * sizeof(int32_t));
  std::memcpy(*tri_idx_out, ti.data(), ti.size() * sizeof(int32_t));
  return (int64_t)pi.size();
}

void triangle_hash_free(void* handle) { delete (TriHash*)handle; }

// ---------------------------------------------------------------------------
// Isosurface extraction: marching tetrahedra on the Kuhn 6-tet subdivision.
// Grid is C-ordered (nx, ny, nz); vertices come out in grid-index coords
// (x, y, z), like mcubes.marching_cubes.
// ---------------------------------------------------------------------------

struct MTState {
  std::vector<double> verts;
  std::vector<int64_t> tris;
  std::unordered_map<uint64_t, int64_t> edge_cache;
};

static int64_t mt_vertex(MTState& st, uint64_t ka, uint64_t kb, double va,
                         double vb, double iso, const double* pa,
                         const double* pb) {
  if (ka > kb) {
    std::swap(ka, kb);
    std::swap(va, vb);
    std::swap(pa, pb);
  }
  uint64_t key = ka * 0x100000000ULL ^ kb;  // grids < 2^32 cells
  auto it = st.edge_cache.find(key);
  if (it != st.edge_cache.end()) return it->second;
  double denom = vb - va;
  double t = denom != 0.0 ? (iso - va) / denom : 0.5;
  t = std::min(std::max(t, 0.0), 1.0);
  int64_t id = (int64_t)(st.verts.size() / 3);
  for (int d = 0; d < 3; ++d)
    st.verts.push_back(pa[d] + t * (pb[d] - pa[d]));
  st.edge_cache.emplace(key, id);
  return id;
}

static void mt_emit(MTState& st, int64_t a, int64_t b, int64_t c,
                    const double* inside_centroid) {
  // Orient the triangle so its normal points away from the inside region.
  const double* A = &st.verts[a * 3];
  const double* B = &st.verts[b * 3];
  const double* C = &st.verts[c * 3];
  double u[3] = {B[0] - A[0], B[1] - A[1], B[2] - A[2]};
  double v[3] = {C[0] - A[0], C[1] - A[1], C[2] - A[2]};
  double n[3] = {u[1] * v[2] - u[2] * v[1], u[2] * v[0] - u[0] * v[2],
                 u[0] * v[1] - u[1] * v[0]};
  double cx = (A[0] + B[0] + C[0]) / 3.0, cy = (A[1] + B[1] + C[1]) / 3.0,
         cz = (A[2] + B[2] + C[2]) / 3.0;
  double d[3] = {inside_centroid[0] - cx, inside_centroid[1] - cy,
                 inside_centroid[2] - cz};
  double dot = n[0] * d[0] + n[1] * d[1] + n[2] * d[2];
  if (dot > 0) std::swap(b, c);
  st.tris.push_back(a);
  st.tris.push_back(b);
  st.tris.push_back(c);
}

static void mt_tet(MTState& st, const uint64_t key[4], const double val[4],
                   const double pos[4][3], double iso) {
  int inside[4], n_in = 0;
  for (int i = 0; i < 4; ++i)
    if (val[i] > iso) inside[n_in++] = i;
  if (n_in == 0 || n_in == 4) return;

  double ic[3] = {0, 0, 0};
  for (int k = 0; k < n_in; ++k)
    for (int d = 0; d < 3; ++d) ic[d] += pos[inside[k]][d] / n_in;

  auto V = [&](int i, int j) {
    return mt_vertex(st, key[i], key[j], val[i], val[j], iso, pos[i], pos[j]);
  };

  if (n_in == 1 || n_in == 3) {
    int a;  // the lone vertex (inside if n_in==1, outside if n_in==3)
    if (n_in == 1) {
      a = inside[0];
    } else {
      bool in[4] = {false, false, false, false};
      for (int k = 0; k < 3; ++k) in[inside[k]] = true;
      a = !in[0] ? 0 : !in[1] ? 1 : !in[2] ? 2 : 3;
    }
    int o[3], m = 0;
    for (int i = 0; i < 4; ++i)
      if (i != a) o[m++] = i;
    mt_emit(st, V(a, o[0]), V(a, o[1]), V(a, o[2]), ic);
  } else {  // 2-2: quad split into two triangles
    int a = inside[0], b = inside[1];
    int o[2], m = 0;
    for (int i = 0; i < 4; ++i)
      if (i != a && i != b) o[m++] = i;
    int64_t v0 = V(a, o[0]), v1 = V(a, o[1]), v2 = V(b, o[1]), v3 = V(b, o[0]);
    mt_emit(st, v0, v1, v2, ic);
    mt_emit(st, v0, v2, v3, ic);
  }
}

int64_t marching_tetrahedra(const float* grid, int64_t nx, int64_t ny,
                            int64_t nz, double iso, double** verts_out,
                            int64_t** tris_out, int64_t* n_tris_out) {
  MTState st;
  // The 6 Kuhn tetrahedra: monotone corner paths 000 -> 111.
  static const int paths[6][3] = {{0, 1, 2}, {0, 2, 1}, {1, 0, 2},
                                  {1, 2, 0}, {2, 0, 1}, {2, 1, 0}};
  for (int64_t x = 0; x + 1 < nx; ++x)
    for (int64_t y = 0; y + 1 < ny; ++y)
      for (int64_t z = 0; z + 1 < nz; ++z) {
        // Skip uniform cells fast.
        double v[2][2][2];
        bool any_in = false, any_out = false;
        for (int dx = 0; dx < 2; ++dx)
          for (int dy = 0; dy < 2; ++dy)
            for (int dz = 0; dz < 2; ++dz) {
              double val =
                  grid[((x + dx) * ny + (y + dy)) * nz + (z + dz)];
              v[dx][dy][dz] = val;
              (val > iso ? any_in : any_out) = true;
            }
        if (!any_in || !any_out) continue;
        for (auto& path : paths) {
          int c[4][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
          for (int s = 0; s < 3; ++s) {
            for (int d = 0; d < 3; ++d) c[s + 1][d] = c[s][d];
            c[s + 1][path[s]] = 1;
          }
          uint64_t key[4];
          double val[4], pos[4][3];
          for (int i = 0; i < 4; ++i) {
            int64_t gx = x + c[i][0], gy = y + c[i][1], gz = z + c[i][2];
            key[i] = (uint64_t)((gx * ny + gy) * nz + gz);
            val[i] = v[c[i][0]][c[i][1]][c[i][2]];
            pos[i][0] = (double)gx;
            pos[i][1] = (double)gy;
            pos[i][2] = (double)gz;
          }
          mt_tet(st, key, val, pos, iso);
        }
      }

  int64_t n_verts = (int64_t)(st.verts.size() / 3);
  *verts_out = (double*)malloc(st.verts.size() * sizeof(double));
  std::memcpy(*verts_out, st.verts.data(), st.verts.size() * sizeof(double));
  *tris_out = (int64_t*)malloc(st.tris.size() * sizeof(int64_t));
  std::memcpy(*tris_out, st.tris.data(), st.tris.size() * sizeof(int64_t));
  *n_tris_out = (int64_t)(st.tris.size() / 3);
  return n_verts;
}

// ---------------------------------------------------------------------------
// Table-based marching cubes (the production extractor).
//
// The reference extracts with mcubes.marching_cubes (utils.py:172-182).
// This is the same MC family: vertices at the identical per-edge linear
// interpolation points.  The 256 case tables are NOT copied from anywhere —
// they are generated at first use from first principles: marching-squares
// segments on the 6 cell faces (ambiguous faces resolved by a fixed
// sign-only rule, so neighbours agree -> watertight), stitched into closed
// loops, fan-triangulated.  tests/mc_oracle.py is the NumPy twin of this
// construction and cross-checks it.
// ---------------------------------------------------------------------------

namespace mc {

// corner index = x*4 + y*2 + z
static const int CORNER[8][3] = {{0, 0, 0}, {0, 0, 1}, {0, 1, 0}, {0, 1, 1},
                                 {1, 0, 0}, {1, 0, 1}, {1, 1, 0}, {1, 1, 1}};
static int EDGE[12][2];
static int edge_of[8][8];  // corner pair -> edge id (-1 if not an edge)
// per case: triangles as triples of cell-edge ids
static std::vector<std::array<int, 3>> case_tris[256];
static bool ready = false;

static void face_segments(int mask, const int c[4],
                          std::vector<std::pair<int, int>>& segs) {
  // c: 4 corner ids in cyclic order; edges[i] joins c[i] and c[(i+1)%4].
  bool in[4];
  int n = 0;
  for (int i = 0; i < 4; ++i) {
    in[i] = (mask >> c[i]) & 1;
    n += in[i];
  }
  if (n == 0 || n == 4) return;
  int e[4];
  for (int i = 0; i < 4; ++i) e[i] = edge_of[c[i]][c[(i + 1) % 4]];
  if (n == 1 || n == 3) {
    int lone = 0;
    for (int i = 0; i < 4; ++i)
      if (in[i] == (n == 1)) lone = i;
    segs.push_back({e[(lone + 3) % 4], e[lone]});
  } else if (in[0] == in[1]) {
    segs.push_back({e[1], e[3]});
  } else if (in[1] == in[2]) {
    segs.push_back({e[0], e[2]});
  } else {  // diagonal: keep the two inside corners disconnected
    int a = in[0] ? 0 : 1;
    segs.push_back({e[(a + 3) % 4], e[a]});
    segs.push_back({e[(a + 1) % 4], e[(a + 2) % 4]});
  }
}

static void build_tables() {
  // edges: corner pairs differing in exactly one axis, in (a, b) a<b order
  int ne = 0;
  for (int a = 0; a < 8; ++a)
    for (int b = 0; b < 8; ++b) edge_of[a][b] = -1;
  for (int a = 0; a < 8; ++a)
    for (int b = a + 1; b < 8; ++b) {
      int diff = 0;
      for (int d = 0; d < 3; ++d) diff += CORNER[a][d] != CORNER[b][d];
      if (diff == 1) {
        EDGE[ne][0] = a;
        EDGE[ne][1] = b;
        edge_of[a][b] = edge_of[b][a] = ne;
        ++ne;
      }
    }
  // faces: (axis, side) -> 4 corners cyclic (collection order 0,1,3,2)
  int faces[6][4];
  int nf = 0;
  for (int axis = 0; axis < 3; ++axis)
    for (int side = 0; side < 2; ++side) {
      int coll[4], m = 0;
      for (int ci = 0; ci < 8; ++ci)
        if (CORNER[ci][axis] == side) coll[m++] = ci;
      faces[nf][0] = coll[0];
      faces[nf][1] = coll[1];
      faces[nf][2] = coll[3];
      faces[nf][3] = coll[2];
      ++nf;
    }
  for (int mask = 1; mask < 255; ++mask) {
    std::vector<std::pair<int, int>> segs;
    for (int f = 0; f < 6; ++f) face_segments(mask, faces[f], segs);
    // stitch into loops: each cut edge has exactly two incident segments
    int adj[12][2];
    int deg[12] = {0};
    for (auto& s : segs) {
      adj[s.first][deg[s.first]++] = s.second;
      adj[s.second][deg[s.second]++] = s.first;
    }
    bool seen[12] = {false};
    for (auto& s : segs) {
      int start = s.first;
      if (seen[start]) continue;
      std::vector<int> loop;
      int cur = start, prev = -1;
      while (true) {
        loop.push_back(cur);
        seen[cur] = true;
        int nxt = -1;
        for (int k = 0; k < deg[cur]; ++k)
          if (adj[cur][k] != prev) nxt = adj[cur][k];
        if (nxt < 0 || nxt == start || seen[nxt]) break;
        prev = cur;
        cur = nxt;
      }
      for (size_t t = 1; t + 1 < loop.size(); ++t)
        case_tris[mask].push_back({loop[0], (int)loop[t], (int)loop[t + 1]});
    }
  }
  ready = true;
}

}  // namespace mc

int64_t marching_cubes_mc(const float* grid, int64_t nx, int64_t ny,
                          int64_t nz, double iso, double** verts_out,
                          int64_t** tris_out, int64_t* n_tris_out) {
  if (!mc::ready) mc::build_tables();
  MTState st;
  for (int64_t x = 0; x + 1 < nx; ++x)
    for (int64_t y = 0; y + 1 < ny; ++y)
      for (int64_t z = 0; z + 1 < nz; ++z) {
        double v[8];
        int mask = 0;
        for (int ci = 0; ci < 8; ++ci) {
          const int* c = mc::CORNER[ci];
          v[ci] = grid[((x + c[0]) * ny + (y + c[1])) * nz + (z + c[2])];
          if (v[ci] < iso) mask |= 1 << ci;
        }
        if (mask == 0 || mask == 255) continue;
        // field gradient (for outward orientation: normal toward +field)
        double gx = 0, gy = 0, gz = 0;
        for (int ci = 0; ci < 8; ++ci) {
          const int* c = mc::CORNER[ci];
          gx += (c[0] ? v[ci] : -v[ci]);
          gy += (c[1] ? v[ci] : -v[ci]);
          gz += (c[2] ? v[ci] : -v[ci]);
        }
        int64_t vid[12];
        for (int e = 0; e < 12; ++e) vid[e] = -1;
        for (auto& tri : mc::case_tris[mask]) {
          for (int k = 0; k < 3; ++k) {
            int e = tri[k];
            if (vid[e] >= 0) continue;
            int a = mc::EDGE[e][0], b = mc::EDGE[e][1];
            const int *ca = mc::CORNER[a], *cb = mc::CORNER[b];
            int64_t gxa = x + ca[0], gya = y + ca[1], gza = z + ca[2];
            int64_t gxb = x + cb[0], gyb = y + cb[1], gzb = z + cb[2];
            uint64_t ka = (uint64_t)((gxa * ny + gya) * nz + gza);
            uint64_t kb = (uint64_t)((gxb * ny + gyb) * nz + gzb);
            double pa[3] = {(double)gxa, (double)gya, (double)gza};
            double pb[3] = {(double)gxb, (double)gyb, (double)gzb};
            vid[e] = mt_vertex(st, ka, kb, v[a], v[b], iso, pa, pb);
          }
          int64_t A = vid[tri[0]], B = vid[tri[1]], C = vid[tri[2]];
          // orient: normal . grad > 0
          const double* pA = &st.verts[A * 3];
          const double* pB = &st.verts[B * 3];
          const double* pC = &st.verts[C * 3];
          double u[3] = {pB[0] - pA[0], pB[1] - pA[1], pB[2] - pA[2]};
          double w[3] = {pC[0] - pA[0], pC[1] - pA[1], pC[2] - pA[2]};
          double n0 = u[1] * w[2] - u[2] * w[1];
          double n1 = u[2] * w[0] - u[0] * w[2];
          double n2 = u[0] * w[1] - u[1] * w[0];
          // callers pass -sdf (utils.py:173 semantics): the object interior
          // has field > iso, so outward normals point toward -gradient
          if (n0 * gx + n1 * gy + n2 * gz > 0) std::swap(B, C);
          st.tris.push_back(A);
          st.tris.push_back(B);
          st.tris.push_back(C);
        }
      }

  int64_t n_verts = (int64_t)(st.verts.size() / 3);
  *verts_out = (double*)malloc(st.verts.size() * sizeof(double));
  std::memcpy(*verts_out, st.verts.data(), st.verts.size() * sizeof(double));
  *tris_out = (int64_t*)malloc(st.tris.size() * sizeof(int64_t));
  std::memcpy(*tris_out, st.tris.data(), st.tris.size() * sizeof(int64_t));
  *n_tris_out = (int64_t)(st.tris.size() / 3);
  return n_verts;
}

// ---------------------------------------------------------------------------
// KD-tree nearest neighbour (3D).
// ---------------------------------------------------------------------------

// Packed-leaf kd-tree (r5, VERDICT r4 #7 profiling: the eval hot spot was
// NOT the ray-stab hash loop but this NN — the old implicit tree visited
// one point per node through an index indirection, ~26 us/query at 100k
// vs 100k.  This version: widest-extent split axis, 16-point LEAF buckets
// whose coordinates are REORDERED into contiguous SoA-ish memory (the
// leaf scan is a flat vectorizable loop), and split-plane pruning.  Exact
// same metric (min over squared distances; sqrt once).
struct KDTree {
  static constexpr int LEAF = 32;
  struct Node {
    double split;
    int32_t axis;      // -1 = leaf
    int32_t right;     // right child (left child = node + 1)
    int64_t lo, hi;    // leaf range in packed order
  };
  std::vector<Node> nodes;
  std::vector<double> P;          // packed coords, build order (AoS)
  std::vector<double> X, Y, Z;    // SoA copies: the leaf scan vectorizes
  std::vector<int64_t> orig;      // packed -> original index

  void build(const double* pts, int64_t n) {
    std::vector<int64_t> idx(n);
    for (int64_t i = 0; i < n; ++i) idx[i] = i;
    nodes.reserve((size_t)(2 * n / LEAF + 8));
    build_rec(pts, idx, 0, n);
    P.resize((size_t)n * 3);
    X.resize(n); Y.resize(n); Z.resize(n);
    orig.resize(n);
    for (int64_t i = 0; i < n; ++i) {
      orig[i] = idx[i];
      for (int d = 0; d < 3; ++d) P[i * 3 + d] = pts[idx[i] * 3 + d];
      X[i] = P[i * 3 + 0]; Y[i] = P[i * 3 + 1]; Z[i] = P[i * 3 + 2];
    }
  }

  int32_t build_rec(const double* pts, std::vector<int64_t>& idx,
                    int64_t lo, int64_t hi) {
    int32_t me = (int32_t)nodes.size();
    nodes.push_back({});
    if (hi - lo <= LEAF) {
      nodes[me] = {0.0, -1, -1, lo, hi};
      return me;
    }
    double mn[3] = {1e300, 1e300, 1e300}, mx[3] = {-1e300, -1e300, -1e300};
    for (int64_t i = lo; i < hi; ++i)
      for (int d = 0; d < 3; ++d) {
        double x = pts[idx[i] * 3 + d];
        mn[d] = std::min(mn[d], x);
        mx[d] = std::max(mx[d], x);
      }
    int axis = 0;
    for (int d = 1; d < 3; ++d)
      if (mx[d] - mn[d] > mx[axis] - mn[axis]) axis = d;
    int64_t mid = (lo + hi) / 2;
    std::nth_element(idx.begin() + lo, idx.begin() + mid, idx.begin() + hi,
                     [&](int64_t a, int64_t b) {
                       return pts[a * 3 + axis] < pts[b * 3 + axis];
                     });
    double split = pts[idx[mid] * 3 + axis];
    build_rec(pts, idx, lo, mid);
    int32_t r = build_rec(pts, idx, mid, hi);
    nodes[me] = {split, (int32_t)axis, r, lo, hi};
    return me;
  }

  // packed-index query: reports the PACKED position of the best point,
  // so consecutive queries can warm-start from it (orig[] maps back).
  void query_packed(const double* q, double& best2, int64_t& best_p) const {
    query_packed_rec(0, q, best2, best_p);
  }
  void query_packed_rec(int32_t ni, const double* q, double& best2,
                        int64_t& best_p) const {
    const Node& nd = nodes[ni];
    if (nd.axis < 0) {
      // two-phase leaf scan over SoA coords: the distance loop has no
      // loop-carried dependency, so it auto-vectorizes; the argmin pass
      // runs on the tiny stack buffer.
      int n = (int)(nd.hi - nd.lo);
      const double* px = &X[nd.lo];
      const double* py = &Y[nd.lo];
      const double* pz = &Z[nd.lo];
      double d2s[LEAF];
      for (int j = 0; j < n; ++j) {
        double dx = q[0] - px[j], dy = q[1] - py[j], dz = q[2] - pz[j];
        d2s[j] = dx * dx + dy * dy + dz * dz;
      }
      for (int j = 0; j < n; ++j)
        if (d2s[j] < best2) {
          best2 = d2s[j];
          best_p = nd.lo + j;
        }
      return;
    }
    double diff = q[nd.axis] - nd.split;
    int32_t near = diff < 0 ? ni + 1 : nd.right;
    int32_t far = diff < 0 ? nd.right : ni + 1;
    query_packed_rec(near, q, best2, best_p);
    if (diff * diff < best2) query_packed_rec(far, q, best2, best_p);
  }
};

static inline uint64_t morton_expand(uint32_t v) {
  uint64_t x = v & 0x1fffff;
  x = (x | x << 32) & 0x1f00000000ffffULL;
  x = (x | x << 16) & 0x1f0000ff0000ffULL;
  x = (x | x << 8) & 0x100f00f00f00f00fULL;
  x = (x | x << 4) & 0x10c30c30c30c30c3ULL;
  x = (x | x << 2) & 0x1249249249249249ULL;
  return x;
}

void kdtree_nn(const double* src, int64_t n_src, const double* dst,
               int64_t n_dst, double* dist_out, int64_t* idx_out) {
  KDTree tree;
  tree.build(dst, n_dst);
  // Morton-sort the queries: consecutive queries then land in nearby
  // space, so (a) tree-path cache lines stay hot and (b) each query can
  // WARM-START its best-distance bound from the previous query's nearest
  // point — an upper bound achieved by a real candidate, so the final
  // min over all points is unchanged (exact).  Measured 2.5x on top of
  // the packed-leaf tree for the 100k-surface-sample chamfer.
  double mn[3] = {1e300, 1e300, 1e300}, mx[3] = {-1e300, -1e300, -1e300};
  for (int64_t i = 0; i < n_src; ++i)
    for (int d = 0; d < 3; ++d) {
      mn[d] = std::min(mn[d], src[i * 3 + d]);
      mx[d] = std::max(mx[d], src[i * 3 + d]);
    }
  double inv[3];
  for (int d = 0; d < 3; ++d) {
    double ext = mx[d] - mn[d];
    inv[d] = ext > 0 ? 1023.0 / ext : 0.0;
  }
  std::vector<std::pair<uint64_t, int64_t>> order(n_src);
  for (int64_t i = 0; i < n_src; ++i) {
    uint64_t key = 0;
    for (int d = 0; d < 3; ++d) {
      uint32_t q = (uint32_t)((src[i * 3 + d] - mn[d]) * inv[d]);
      key |= morton_expand(q) << d;
    }
    order[i] = {key, i};
  }
  std::sort(order.begin(), order.end());
  parallel_for(n_src, [&](int64_t i_lo, int64_t i_hi) {
    int64_t prev_p = -1;
    for (int64_t k = i_lo; k < i_hi; ++k) {
      int64_t i = order[k].second;
      const double* q = &src[i * 3];
      double best2 = std::numeric_limits<double>::infinity();
      int64_t best_p = -1;
      if (prev_p >= 0) {  // warm start: bound from the previous nearest
        double dx = q[0] - tree.P[prev_p * 3 + 0];
        double dy = q[1] - tree.P[prev_p * 3 + 1];
        double dz = q[2] - tree.P[prev_p * 3 + 2];
        best2 = dx * dx + dy * dy + dz * dz;
        best_p = prev_p;
      }
      tree.query_packed(q, best2, best_p);
      prev_p = best_p;
      dist_out[i] = std::sqrt(best2);
      if (idx_out) idx_out[i] = best_p >= 0 ? tree.orig[best_p] : -1;
    }
  });
}

// ---------------------------------------------------------------------------
// Signed distance: BVH point-triangle distance; sign from parity stabbing.
// ---------------------------------------------------------------------------

static double point_tri_dist2(const double* p, const double* a,
                              const double* b, const double* c) {
  // Ericson, Real-Time Collision Detection: closest point on triangle.
  double ab[3], ac[3], ap[3];
  for (int d = 0; d < 3; ++d) {
    ab[d] = b[d] - a[d];
    ac[d] = c[d] - a[d];
    ap[d] = p[d] - a[d];
  }
  auto dot = [](const double* u, const double* v) {
    return u[0] * v[0] + u[1] * v[1] + u[2] * v[2];
  };
  double d1 = dot(ab, ap), d2 = dot(ac, ap);
  auto dist2_to = [&](double qx, double qy, double qz) {
    double dx = p[0] - qx, dy = p[1] - qy, dz = p[2] - qz;
    return dx * dx + dy * dy + dz * dz;
  };
  if (d1 <= 0 && d2 <= 0) return dist2_to(a[0], a[1], a[2]);
  double bp[3] = {p[0] - b[0], p[1] - b[1], p[2] - b[2]};
  double d3 = dot(ab, bp), d4 = dot(ac, bp);
  if (d3 >= 0 && d4 <= d3) return dist2_to(b[0], b[1], b[2]);
  double vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) {
    double t = d1 / (d1 - d3);
    return dist2_to(a[0] + t * ab[0], a[1] + t * ab[1], a[2] + t * ab[2]);
  }
  double cp[3] = {p[0] - c[0], p[1] - c[1], p[2] - c[2]};
  double d5 = dot(ab, cp), d6 = dot(ac, cp);
  if (d6 >= 0 && d5 <= d6) return dist2_to(c[0], c[1], c[2]);
  double vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) {
    double t = d2 / (d2 - d6);
    return dist2_to(a[0] + t * ac[0], a[1] + t * ac[1], a[2] + t * ac[2]);
  }
  double va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    double t = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    return dist2_to(b[0] + t * (c[0] - b[0]), b[1] + t * (c[1] - b[1]),
                    b[2] + t * (c[2] - b[2]));
  }
  double denom = 1.0 / (va + vb + vc);
  double v = vb * denom, w = vc * denom;
  return dist2_to(a[0] + ab[0] * v + ac[0] * w, a[1] + ab[1] * v + ac[1] * w,
                  a[2] + ab[2] * v + ac[2] * w);
}

struct BVHNode {
  double bmin[3], bmax[3];
  int64_t left, right;   // children, or -1
  int64_t start, count;  // leaf triangle range
};

struct BVH {
  std::vector<BVHNode> nodes;
  std::vector<int64_t> tri_idx;
  const double* V;
  const int64_t* F;

  double tri_coord(int64_t t, int v, int d) const {
    return V[F[t * 3 + v] * 3 + d];
  }

  int64_t build(int64_t start, int64_t count) {
    BVHNode node;
    for (int d = 0; d < 3; ++d) {
      node.bmin[d] = 1e300;
      node.bmax[d] = -1e300;
    }
    for (int64_t i = start; i < start + count; ++i)
      for (int v = 0; v < 3; ++v)
        for (int d = 0; d < 3; ++d) {
          double x = tri_coord(tri_idx[i], v, d);
          node.bmin[d] = std::min(node.bmin[d], x);
          node.bmax[d] = std::max(node.bmax[d], x);
        }
    node.left = node.right = -1;
    node.start = start;
    node.count = count;
    int64_t id = (int64_t)nodes.size();
    nodes.push_back(node);
    if (count <= 4) return id;
    int axis = 0;
    double ext = -1;
    for (int d = 0; d < 3; ++d)
      if (node.bmax[d] - node.bmin[d] > ext) {
        ext = node.bmax[d] - node.bmin[d];
        axis = d;
      }
    int64_t mid = start + count / 2;
    std::nth_element(
        tri_idx.begin() + start, tri_idx.begin() + mid,
        tri_idx.begin() + start + count, [&](int64_t a, int64_t b) {
          double ca = tri_coord(a, 0, axis) + tri_coord(a, 1, axis) +
                      tri_coord(a, 2, axis);
          double cb = tri_coord(b, 0, axis) + tri_coord(b, 1, axis) +
                      tri_coord(b, 2, axis);
          return ca < cb;
        });
    int64_t l = build(start, mid - start);
    int64_t r = build(mid, start + count - mid);
    nodes[id].left = l;
    nodes[id].right = r;
    nodes[id].count = 0;
    return id;
  }

  double box_dist2(const BVHNode& n, const double* p) const {
    double d2 = 0;
    for (int d = 0; d < 3; ++d) {
      double t = std::max({n.bmin[d] - p[d], 0.0, p[d] - n.bmax[d]});
      d2 += t * t;
    }
    return d2;
  }

  void query(int64_t ni, const double* p, double& best2) const {
    const BVHNode& n = nodes[ni];
    if (box_dist2(n, p) >= best2) return;
    if (n.left < 0) {
      for (int64_t i = n.start; i < n.start + n.count; ++i) {
        int64_t t = tri_idx[i];
        double d2 = point_tri_dist2(p, &V[F[t * 3 + 0] * 3],
                                    &V[F[t * 3 + 1] * 3], &V[F[t * 3 + 2] * 3]);
        best2 = std::min(best2, d2);
      }
      return;
    }
    double dl = box_dist2(nodes[n.left], p), dr = box_dist2(nodes[n.right], p);
    if (dl < dr) {
      query(n.left, p, best2);
      query(n.right, p, best2);
    } else {
      query(n.right, p, best2);
      query(n.left, p, best2);
    }
  }
};

void unsigned_distance(const double* verts, int64_t n_verts,
                       const int64_t* faces, int64_t n_faces,
                       const double* pts, int64_t n_pts, double* dist_out) {
  (void)n_verts;
  BVH bvh;
  bvh.V = verts;
  bvh.F = faces;
  bvh.tri_idx.resize(n_faces);
  for (int64_t i = 0; i < n_faces; ++i) bvh.tri_idx[i] = i;
  bvh.build(0, n_faces);
  parallel_for(n_pts, [&](int64_t i_lo, int64_t i_hi) {
    for (int64_t i = i_lo; i < i_hi; ++i) {
      double best2 = std::numeric_limits<double>::infinity();
      bvh.query(0, &pts[i * 3], best2);
      dist_out[i] = std::sqrt(best2);
    }
  });
}

void signed_distance(const double* verts, int64_t n_verts,
                     const int64_t* faces, int64_t n_faces, const double* pts,
                     int64_t n_pts, int hash_resolution, double* sdf_out) {
  unsigned_distance(verts, n_verts, faces, n_faces, pts, n_pts, sdf_out);
  // Sign via parity (positive outside, igl convention).
  std::vector<double> tri(n_faces * 9);
  for (int64_t t = 0; t < n_faces; ++t)
    for (int v = 0; v < 3; ++v)
      for (int d = 0; d < 3; ++d)
        tri[(t * 3 + v) * 3 + d] = verts[faces[t * 3 + v] * 3 + d];
  std::vector<uint8_t> contains(n_pts), holes(n_pts);
  inside_mesh(tri.data(), n_faces, pts, n_pts, hash_resolution,
              contains.data(), holes.data());
  for (int64_t i = 0; i < n_pts; ++i)
    if (contains[i]) sdf_out[i] = -sdf_out[i];
}

}  // extern "C"
