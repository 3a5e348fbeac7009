/* Native host-side DensePose result extraction.
 *
 * Fuses, per detected instance, what the reference does with four
 * F.interpolate calls + argmax + a 24-way python gather loop
 * (visualizer.py:10-37): bilinear-resize the SIUV maps to the box size
 * (torch align_corners=False semantics), argmax coarse (foreground mask) and
 * fine (part labels), and gather the per-part U/V values — in ONE pass over
 * the output pixels with no intermediate (h, w, 25) allocations.
 *
 * Layout: all inputs are HWC float32 (the device output layout); outputs are
 * labels (h*w) int32 and uv (2*h*w) float32.
 *
 * Built as a plain shared object (no Python.h); loaded via ctypes.
 */

#include <stdint.h>
#include <math.h>

static inline void axis_coord(int out_i, int in_size, float ratio,
                              int *i0, int *i1, float *w1) {
    float src = ((float)out_i + 0.5f) * ratio - 0.5f;
    if (src < 0.0f) src = 0.0f;
    int lo = (int)src;
    if (lo > in_size - 1) lo = in_size - 1;
    int hi = lo + 1;
    float frac = src - (float)lo;
    if (hi > in_size - 1) { hi = in_size - 1; frac = 0.0f; }
    *i0 = lo; *i1 = hi; *w1 = frac;
}

/* bilinear sample of channel c at precomputed corners */
static inline float blerp(const float *img, int W, int C,
                          int y0, int y1, float wy,
                          int x0, int x1, float wx, int c) {
    const float a = img[(y0 * W + x0) * C + c];
    const float b = img[(y0 * W + x1) * C + c];
    const float d = img[(y1 * W + x0) * C + c];
    const float e = img[(y1 * W + x1) * C + c];
    float top = a + (b - a) * wx;
    float bot = d + (e - d) * wx;
    return top + (bot - top) * wy;
}

void resample_instance(
    const float *coarse, int kc,   /* (H, W, kc) */
    const float *fine,   int kf,   /* (H, W, kf) */
    const float *u, const float *v, /* (H, W, kf) */
    int in_h, int in_w,
    int out_h, int out_w,
    int32_t *labels_out,           /* (out_h * out_w) */
    float *uv_out                  /* (2 * out_h * out_w) */
) {
    const float ry = (float)in_h / (float)out_h;
    const float rx = (float)in_w / (float)out_w;
    const int npix = out_h * out_w;

    for (int oy = 0; oy < out_h; ++oy) {
        int y0, y1; float wy;
        axis_coord(oy, in_h, ry, &y0, &y1, &wy);
        for (int ox = 0; ox < out_w; ++ox) {
            int x0, x1; float wx;
            axis_coord(ox, in_w, rx, &x0, &x1, &wx);

            /* coarse argmax -> foreground */
            int best_c = 0; float best_cv = -1e30f;
            for (int c = 0; c < kc; ++c) {
                float val = blerp(coarse, in_w, kc, y0, y1, wy, x0, x1, wx, c);
                if (val > best_cv) { best_cv = val; best_c = c; }
            }
            int label = 0;
            if (best_c > 0) {
                int best_f = 0; float best_fv = -1e30f;
                for (int c = 0; c < kf; ++c) {
                    float val = blerp(fine, in_w, kf, y0, y1, wy, x0, x1, wx, c);
                    if (val > best_fv) { best_fv = val; best_f = c; }
                }
                label = best_f;
            }
            const int o = oy * out_w + ox;
            labels_out[o] = label;
            if (label > 0) {
                uv_out[o] = blerp(u, in_w, kf, y0, y1, wy, x0, x1, wx, label);
                uv_out[npix + o] = blerp(v, in_w, kf, y0, y1, wy, x0, x1, wx, label);
            } else {
                uv_out[o] = 0.0f;
                uv_out[npix + o] = 0.0f;
            }
        }
    }
}
