// Native track-graph runtime: observation-table bookkeeping.
//
// The C++ runtime piece of the incremental pipeline's host-side state
// machine — the roles the reference implements natively in
// SfM::mergeNewPointCloud (SfMToyLib/SfM.cpp:530-629, new-point merge by
// matching-feature confirmation) and SfM::find2D3DMatches
// (SfM.cpp:471-528, the views x cloud x matches scan). State is flat
// arrays shared with Python via ctypes (zero-copy):
//   xyz:        cap x 3 float32
//   obs:        cap x V int32 (feature index per view, -1 sentinel)
//   feat2point: V x F int32   (inverse map, -1 sentinel)

#include <cstdint>

extern "C" {

// Merge n_new triangulated points seen as (fi in view vi, fj in view vj).
// Returns the new n_points. stats[0] = appended, stats[1] = merged obs.
int tpusfm_insert_points(float* xyz, int32_t* obs, int32_t* feat2point,
                         int cap, int V, int F, int n_points, int vi, int vj,
                         const float* nxyz, const int32_t* fi,
                         const int32_t* fj, int n_new, int32_t* stats) {
  int appended = 0, merged = 0;
  for (int k = 0; k < n_new; k++) {
    const int32_t a = fi[k], b = fj[k];
    if (a < 0 || a >= F || b < 0 || b >= F) continue;
    const int32_t pa = feat2point[(int64_t)vi * F + a];
    const int32_t pb = feat2point[(int64_t)vj * F + b];
    if (pa >= 0 && pb >= 0) continue;  // both claimed (same or conflicting track)
    if (pa >= 0) {                     // known via vi -> attach vj observation
      obs[(int64_t)pa * V + vj] = b;
      feat2point[(int64_t)vj * F + b] = pa;
      merged++;
    } else if (pb >= 0) {              // known via vj -> attach vi observation
      obs[(int64_t)pb * V + vi] = a;
      feat2point[(int64_t)vi * F + a] = pb;
      merged++;
    } else {                           // brand-new map point
      if (n_points >= cap) continue;
      const int r = n_points++;
      xyz[(int64_t)r * 3 + 0] = nxyz[(int64_t)k * 3 + 0];
      xyz[(int64_t)r * 3 + 1] = nxyz[(int64_t)k * 3 + 1];
      xyz[(int64_t)r * 3 + 2] = nxyz[(int64_t)k * 3 + 2];
      obs[(int64_t)r * V + vi] = a;
      obs[(int64_t)r * V + vj] = b;
      feat2point[(int64_t)vi * F + a] = r;
      feat2point[(int64_t)vj * F + b] = r;
      appended++;
    }
  }
  stats[0] = appended;
  stats[1] = merged;
  return n_points;
}

// Full mergeNewPointCloud semantics (SfMToyLib/SfM.cpp:530-629, constants
// :50-51), sequential like the reference:
//   - exact-feature claim: the feature is already owned -> attach
//   - transitive claim (legacy strengthening, MultiCameraPnP.cpp:393-441):
//     the feature matches, through another view, a feature that owns a
//     point -> attach
//   - 3D distance < merge_dist to an existing point, confirmed by a 2D
//     match of distance < feat_dist between originating views -> attach
//   - close but unconfirmed -> dropped (reference adds a point only when
//     `!foundAnyMatchingExistingViews && !foundMatching3DPoint`)
//   - otherwise append as a new point.
// Match lookups: right_of/left_of/rdist are (P+1) x (F+1) tables (row P and
// column F are trash); pair_row is V x V -> pair row (or P).
// stats[0]=appended, stats[1]=merged, stats[2]=dropped. Returns n_points.
// strengthen_dist bounds the transitive-claim hop match (the same knob the
// numpy fallback and fused engine read as strengthen_max_match_distance);
// feat_dist is used ONLY for the 3D-merge feature confirmation (SfM.cpp:51).
// A transitive claim must additionally REPROJECT within reproj_gate pixels
// in both originating views (poses: V x 3x4 row-major; feat_xy: V x F x 2;
// pinhole focal/cx/cy) — descriptor-only hops chain wrong tracks on
// repetitive texture. reproj_gate <= 0 disables the check.
int tpusfm_insert_points_v2(
    float* xyz, int32_t* obs, int32_t* feat2point, int cap, int V, int F,
    int n_points, int vi, int vj, const float* nxyz, const int32_t* fi,
    const int32_t* fj, int n_new, const int32_t* pair_row,
    const int32_t* right_of, const float* rdist, const int32_t* left_of,
    float merge_dist, float feat_dist, float strengthen_dist, int strengthen,
    const float* poses, const float* feat_xy, float focal, float cx, float cy,
    float reproj_gate, int32_t* stats) {
  int appended = 0, merged = 0, dropped = 0;
  const float merge_d2 = merge_dist * merge_dist;
  const int64_t L = F + 1;  // lookup row stride

  auto partner = [&](int v_new, int32_t f_new, int w) -> int32_t {
    if (v_new == w || f_new < 0 || f_new >= F) return -1;
    const int a = v_new < w ? v_new : w;
    const int b = v_new < w ? w : v_new;
    const int32_t p = pair_row[(int64_t)a * V + b];
    return v_new < w ? right_of[p * L + f_new] : left_of[p * L + f_new];
  };
  auto match_dist_of = [&](int lv, int32_t lf, int32_t rf) -> float {
    if (lf < 0 || lf >= F) return 1e9f;
    (void)lv;
    return 0.0f;  // unused; distance read at call site
  };
  (void)match_dist_of;

  for (int k = 0; k < n_new; k++) {
    const int32_t a = fi[k], b = fj[k];
    if (a < 0 || a >= F || b < 0 || b >= F) continue;
    const int32_t pa = feat2point[(int64_t)vi * F + a];
    const int32_t pb = feat2point[(int64_t)vj * F + b];
    int32_t target = pa >= 0 ? pa : pb;

    if (target < 0 && strengthen) {  // transitive claims
      auto hop_dist = [&](int v_new, int32_t f_new, int32_t cand, int w) -> float {
        const int aa = v_new < w ? v_new : w;
        const int bb = v_new < w ? w : v_new;
        const int32_t p = pair_row[(int64_t)aa * V + bb];
        const int32_t lf = v_new < w ? f_new : cand;
        return (lf >= 0 && lf < F) ? rdist[p * L + lf] : 1e9f;
      };
      // geometric confirmation of a hop claim: the map point must
      // reproject within reproj_gate px of the new features in BOTH
      // originating views (in front of each camera)
      auto reproj_ok = [&](int32_t t) -> bool {
        if (reproj_gate <= 0 || !poses || !feat_xy) return true;
        const float* X = xyz + (int64_t)t * 3;
        const float g2 = reproj_gate * reproj_gate;
        const int vs[2] = {vi, vj};
        const int32_t fs[2] = {a, b};
        for (int s = 0; s < 2; s++) {
          const float* P = poses + (int64_t)vs[s] * 12;
          const float px = P[0] * X[0] + P[1] * X[1] + P[2] * X[2] + P[3];
          const float py = P[4] * X[0] + P[5] * X[1] + P[6] * X[2] + P[7];
          const float pz = P[8] * X[0] + P[9] * X[1] + P[10] * X[2] + P[11];
          if (pz <= 1e-9f) return false;
          const float u = px / pz * focal + cx;
          const float v = py / pz * focal + cy;
          const float* uv = feat_xy + ((int64_t)vs[s] * F + fs[s]) * 2;
          const float du = u - uv[0], dv = v - uv[1];
          if (du * du + dv * dv >= g2) return false;
        }
        return true;
      };
      for (int w = 0; w < V && target < 0; w++) {
        if (w == vi || w == vj) continue;
        int32_t cand = partner(vi, a, w);
        if (cand >= 0 && cand < F && hop_dist(vi, a, cand, w) < strengthen_dist) {
          const int32_t p3d = feat2point[(int64_t)w * F + cand];
          if (p3d >= 0 && reproj_ok(p3d)) { target = p3d; break; }
        }
        cand = partner(vj, b, w);
        if (cand >= 0 && cand < F && hop_dist(vj, b, cand, w) < strengthen_dist) {
          const int32_t p3d = feat2point[(int64_t)w * F + cand];
          if (p3d >= 0 && reproj_ok(p3d)) { target = p3d; break; }
        }
      }
    }

    bool close = false;
    if (target < 0) {  // 3D-distance merge with feature confirmation
      const float x = nxyz[(int64_t)k * 3], y = nxyz[(int64_t)k * 3 + 1],
                  z = nxyz[(int64_t)k * 3 + 2];
      for (int n = 0; n < n_points; n++) {
        const float dx = xyz[(int64_t)n * 3] - x;
        const float dy = xyz[(int64_t)n * 3 + 1] - y;
        const float dz = xyz[(int64_t)n * 3 + 2] - z;
        if (dx * dx + dy * dy + dz * dz >= merge_d2) continue;
        close = true;
        // confirm: any originating view of n matched to (vi,a) or (vj,b)
        for (int w = 0; w < V && target < 0; w++) {
          const int32_t fe = obs[(int64_t)n * V + w];
          if (fe < 0 || fe >= F) continue;
          for (int s = 0; s < 2 && target < 0; s++) {
            const int v_new = s == 0 ? vi : vj;
            const int32_t f_new = s == 0 ? a : b;
            if (w == v_new) continue;
            const int lv = v_new < w ? v_new : w;
            const int rv = v_new < w ? w : v_new;
            const int32_t lf = v_new < w ? f_new : fe;
            const int32_t rf = v_new < w ? fe : f_new;
            const int32_t p = pair_row[(int64_t)lv * V + rv];
            if (right_of[p * L + lf] == rf && rdist[p * L + lf] < feat_dist)
              target = n;
          }
        }
        if (target >= 0) break;
      }
    }

    if (target >= 0) {  // attach both observations
      obs[(int64_t)target * V + vi] = a;
      obs[(int64_t)target * V + vj] = b;
      feat2point[(int64_t)vi * F + a] = target;
      feat2point[(int64_t)vj * F + b] = target;
      merged++;
    } else if (close) {
      dropped++;  // close but unconfirmed (SfM.cpp:596-600)
    } else {
      if (n_points >= cap) continue;
      const int r = n_points++;
      xyz[(int64_t)r * 3 + 0] = nxyz[(int64_t)k * 3 + 0];
      xyz[(int64_t)r * 3 + 1] = nxyz[(int64_t)k * 3 + 1];
      xyz[(int64_t)r * 3 + 2] = nxyz[(int64_t)k * 3 + 2];
      obs[(int64_t)r * V + vi] = a;
      obs[(int64_t)r * V + vj] = b;
      feat2point[(int64_t)vi * F + a] = r;
      feat2point[(int64_t)vj * F + b] = r;
      appended++;
    }
  }
  stats[0] = appended;
  stats[1] = merged;
  stats[2] = dropped;
  return n_points;
}

// 2D-3D correspondences for an unregistered view: scan its matches
// against every good view; a partner feature claimed by a map point
// yields (feature in `view`, point index). Later good views overwrite
// earlier ones (same semantics as the Python path). Returns the count.
//
// pair_row[a * V + b] is the row of pair (a < b) in the match arrays,
// or -1. match_idx is P x M x 2 (left-view feature, right-view feature);
// match_valid is P x M bytes.
int tpusfm_find_2d3d(const int32_t* feat2point, int V, int F, int view,
                     const int32_t* good_views, int n_good,
                     const int32_t* pair_row, const int32_t* match_idx,
                     const uint8_t* match_valid, int M,
                     int32_t* point_of_feat /* F, caller-init to -1 */,
                     int32_t* out_feats, int32_t* out_pts) {
  for (int g_i = 0; g_i < n_good; g_i++) {
    const int g = good_views[g_i];
    if (g == view) continue;
    const int a = view < g ? view : g;
    const int b = view < g ? g : view;
    const int32_t p = pair_row[(int64_t)a * V + b];
    if (p < 0) continue;
    const int32_t* mi = match_idx + (int64_t)p * M * 2;
    const uint8_t* mv = match_valid + (int64_t)p * M;
    for (int m = 0; m < M; m++) {
      if (!mv[m]) continue;
      const int32_t f_view = view < g ? mi[m * 2] : mi[m * 2 + 1];
      const int32_t f_g = view < g ? mi[m * 2 + 1] : mi[m * 2];
      if (f_view < 0 || f_view >= F || f_g < 0 || f_g >= F) continue;
      const int32_t pt = feat2point[(int64_t)g * F + f_g];
      if (pt >= 0) point_of_feat[f_view] = pt;
    }
  }
  int count = 0;
  for (int f = 0; f < F; f++) {
    if (point_of_feat[f] >= 0) {
      out_feats[count] = f;
      out_pts[count] = point_of_feat[f];
      count++;
    }
  }
  return count;
}

}  // extern "C"
