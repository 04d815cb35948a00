// Native host-side kernels for the SE-SSD TPU framework.
//
// C++ replacement for the reference's numba-jitted evaluation kernels
// (det3d/datasets/utils/eval.py:144-290 compute_statistics_jit and the
// image_box_overlap helper). Built as a plain shared library and loaded via
// ctypes (sessd_tpu/utils/native.py) -- no pybind11 required.
//
// The greedy matching semantics mirror the official KITTI devkit:
// gts iterate in order; in threshold mode (compute_fp=false) a gt takes the
// highest-scoring unassigned detection overlapping above min_overlap; in
// scoring mode it takes the max-overlap non-ignored detection, with ignored
// detections only as a fallback; bbox-metric false positives overlapping
// don't-care regions are absorbed.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

static double image_overlap_1(const double* a, const double* b, int criterion) {
  double iw = std::fmin(a[2], b[2]) - std::fmax(a[0], b[0]);
  if (iw <= 0) return 0.0;
  double ih = std::fmin(a[3], b[3]) - std::fmax(a[1], b[1]);
  if (ih <= 0) return 0.0;
  double inter = iw * ih;
  double area_a = (a[2] - a[0]) * (a[3] - a[1]);
  double area_b = (b[2] - b[0]) * (b[3] - b[1]);
  double denom;
  if (criterion == -1) denom = area_a + area_b - inter;
  else if (criterion == 0) denom = area_a;
  else denom = area_b;
  return denom > 0 ? inter / denom : 0.0;
}

// overlaps: [det_size, gt_size] row-major (det-major, matching the python
// fallback's overlaps[j, i]).
void compute_statistics(
    const double* overlaps,
    const double* gt_datas,   // [gt_size, 5]  bbox(4) + alpha
    const double* dt_datas,   // [det_size, 6] bbox(4) + alpha + score
    const int64_t* ignored_gt,
    const int64_t* ignored_det,
    const double* dc_bboxes,  // [num_dc, 4]
    int64_t num_dc,
    int64_t metric,
    double min_overlap,
    double thresh,
    int64_t compute_fp,
    int64_t compute_aos,
    int64_t gt_size,
    int64_t det_size,
    int64_t* out_tpfpfn,      // [3]
    double* out_similarity,   // [1]
    double* out_thresholds,   // [gt_size]
    int64_t* out_n_thresh) {  // [1]
  const double NO_DET = -10000000.0;
  std::vector<char> assigned(det_size, 0);
  std::vector<char> ignored_threshold(det_size, 0);
  if (compute_fp) {
    for (int64_t j = 0; j < det_size; ++j)
      if (dt_datas[j * 6 + 5] < thresh) ignored_threshold[j] = 1;
  }
  int64_t tp = 0, fp = 0, fn = 0;
  double similarity = 0.0;
  int64_t thresh_idx = 0;
  std::vector<double> delta;
  delta.reserve(gt_size);

  for (int64_t i = 0; i < gt_size; ++i) {
    if (ignored_gt[i] == -1) continue;
    int64_t det_idx = -1;
    double valid_detection = NO_DET;
    double max_overlap = 0.0;
    bool assigned_ignored_det = false;
    for (int64_t j = 0; j < det_size; ++j) {
      if (ignored_det[j] == -1 || assigned[j] || ignored_threshold[j]) continue;
      double overlap = overlaps[j * gt_size + i];
      double score = dt_datas[j * 6 + 5];
      if (!compute_fp && overlap > min_overlap && score > valid_detection) {
        det_idx = j;
        valid_detection = score;
      } else if (compute_fp && overlap > min_overlap &&
                 (overlap > max_overlap || assigned_ignored_det) &&
                 ignored_det[j] == 0) {
        max_overlap = overlap;
        det_idx = j;
        valid_detection = 1.0;
        assigned_ignored_det = false;
      } else if (compute_fp && overlap > min_overlap &&
                 valid_detection == NO_DET && ignored_det[j] == 1) {
        det_idx = j;
        valid_detection = 1.0;
        assigned_ignored_det = true;
      }
    }
    if (valid_detection == NO_DET && ignored_gt[i] == 0) {
      fn += 1;
    } else if (valid_detection != NO_DET &&
               (ignored_gt[i] == 1 || ignored_det[det_idx] == 1)) {
      assigned[det_idx] = 1;
    } else if (valid_detection != NO_DET) {
      tp += 1;
      out_thresholds[thresh_idx++] = dt_datas[det_idx * 6 + 5];
      if (compute_aos) delta.push_back(gt_datas[i * 5 + 4] - dt_datas[det_idx * 6 + 4]);
      assigned[det_idx] = 1;
    }
  }

  if (compute_fp) {
    for (int64_t j = 0; j < det_size; ++j) {
      if (!(assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1 ||
            ignored_threshold[j]))
        fp += 1;
    }
    int64_t nstuff = 0;
    if (metric == 0 && num_dc > 0) {
      for (int64_t i = 0; i < num_dc; ++i) {
        for (int64_t j = 0; j < det_size; ++j) {
          if (assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1 ||
              ignored_threshold[j])
            continue;
          if (image_overlap_1(dt_datas + j * 6, dc_bboxes + i * 4, 0) >
              min_overlap) {
            assigned[j] = 1;
            nstuff += 1;
          }
        }
      }
    }
    fp -= nstuff;
    if (compute_aos) {
      double s = 0.0;
      for (double d : delta) s += (1.0 + std::cos(d)) / 2.0;
      similarity = (tp > 0 || fp > 0) ? s : -1.0;
    }
  }

  out_tpfpfn[0] = tp;
  out_tpfpfn[1] = fp;
  out_tpfpfn[2] = fn;
  out_similarity[0] = similarity;
  out_n_thresh[0] = thresh_idx;
}

// Fused per-frame PR accumulation over all score thresholds — the
// equivalent of the reference's fused_compute_statistics
// (kitti_object_eval_python/eval.py:311-358): one library call per frame
// instead of one per (frame, threshold), accumulating into out_pr += .
void compute_statistics_fused(
    const double* overlaps,
    const double* gt_datas,
    const double* dt_datas,
    const int64_t* ignored_gt,
    const int64_t* ignored_det,
    const double* dc_bboxes,
    int64_t num_dc,
    int64_t metric,
    double min_overlap,
    const double* thresholds,
    int64_t n_thresh,
    int64_t compute_aos,
    int64_t gt_size,
    int64_t det_size,
    double* out_pr) {  // [n_thresh, 4] tp/fp/fn/similarity, accumulated
  int64_t tpfpfn[3];
  double sim[1];
  int64_t nt[1];
  std::vector<double> scratch((size_t)(gt_size > 0 ? gt_size : 1));
  for (int64_t t = 0; t < n_thresh; ++t) {
    compute_statistics(overlaps, gt_datas, dt_datas, ignored_gt, ignored_det,
                       dc_bboxes, num_dc, metric, min_overlap, thresholds[t],
                       1, compute_aos, gt_size, det_size, tpfpfn, sim,
                       scratch.data(), nt);
    out_pr[t * 4 + 0] += (double)tpfpfn[0];
    out_pr[t * 4 + 1] += (double)tpfpfn[1];
    out_pr[t * 4 + 2] += (double)tpfpfn[2];
    if (compute_aos && sim[0] != -1.0) out_pr[t * 4 + 3] += sim[0];
  }
}

}  // extern "C"
