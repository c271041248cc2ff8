// vello_tpu native host runtime: the scene-encoding hot loop.
//
// Role of the reference's Rust host encoder (vello_encoding/src/path.rs
// PathEncoder state machine): converts verb/point arrays into the packed
// tag/data streams. Exact mirror of the Python PathEncoder in
// vello_tpu/encoding/encoding.py (byte-identical output, tested).
//
// Build: g++ -O2 -shared -fPIC -o libvello_native.so vello_native.cpp

#include <cstdint>
#include <cstring>
#include <cmath>

namespace {

constexpr uint8_t TAG_LINE = 1;
constexpr uint8_t TAG_QUAD = 2;
constexpr uint8_t TAG_CUBIC = 3;
constexpr uint8_t TAG_END_BIT = 0x4;

constexpr uint8_t MOVE_TO = 0;
constexpr uint8_t LINE_TO = 1;
constexpr uint8_t QUAD_TO = 2;
constexpr uint8_t CURVE_TO = 3;
constexpr uint8_t CLOSE = 4;

struct Enc {
    uint8_t* tags;
    float* data;
    int n_tags = 0;
    int n_data = 0;  // floats
    double first_x = 0, first_y = 0;
    double cur_x = 0, cur_y = 0;
    bool start_in_data = false;
    int nsub_segs = 0;
    int n_segments = 0;
    int last_tag_idx = -1;

    void push_pt(double x, double y) {
        data[n_data++] = (float)x;
        data[n_data++] = (float)y;
    }

    void emit(uint8_t kind, const double* pts, int npts) {
        if (kind == TAG_LINE && pts[0] == cur_x && pts[1] == cur_y) return;
        if (!start_in_data) {
            push_pt(cur_x, cur_y);
            first_x = cur_x;
            first_y = cur_y;
            start_in_data = true;
        }
        tags[n_tags++] = kind;
        last_tag_idx = n_tags - 1;
        for (int i = 0; i < npts; i++) push_pt(pts[2 * i], pts[2 * i + 1]);
        cur_x = pts[2 * (npts - 1)];
        cur_y = pts[2 * (npts - 1) + 1];
        nsub_segs++;
        n_segments++;
    }

    void end_subpath(bool close_line) {
        if (nsub_segs == 0) {
            if (start_in_data) {
                n_data -= 2;  // lone moveto
                start_in_data = false;
            }
            return;
        }
        if (close_line && (cur_x != first_x || cur_y != first_y)) {
            double p[2] = {first_x, first_y};
            emit(TAG_LINE, p, 1);
        }
        tags[last_tag_idx] |= TAG_END_BIT;
        nsub_segs = 0;
        start_in_data = false;
    }
};

}  // namespace

extern "C" {

// Returns n_segments. out_tags must hold >= n_verbs + 2 entries; out_data
// >= 2 * (n_points + n_verbs + 2) floats. Sizes written to out_counts[0..1]
// = (n_tags, n_data_floats).
int vn_encode_path(const uint8_t* verbs, int n_verbs, const float* pts,
                   int close_subpaths, uint8_t* out_tags, float* out_data,
                   int* out_counts) {
    Enc e{out_tags, out_data};
    int pi = 0;
    for (int v = 0; v < n_verbs; v++) {
        switch (verbs[v]) {
            case MOVE_TO: {
                e.end_subpath(true);
                e.first_x = pts[pi];
                e.first_y = pts[pi + 1];
                e.cur_x = e.first_x;
                e.cur_y = e.first_y;
                e.push_pt(e.first_x, e.first_y);
                e.start_in_data = true;
                e.nsub_segs = 0;
                pi += 2;
                break;
            }
            case LINE_TO: {
                double p[2] = {pts[pi], pts[pi + 1]};
                if (e.start_in_data || e.nsub_segs || e.n_tags || true) {
                    // cur_pt None only before any moveto; mirror Python guard
                }
                e.emit(TAG_LINE, p, 1);
                pi += 2;
                break;
            }
            case QUAD_TO: {
                double p[4] = {pts[pi], pts[pi + 1], pts[pi + 2],
                               pts[pi + 3]};
                e.emit(TAG_QUAD, p, 2);
                pi += 4;
                break;
            }
            case CURVE_TO: {
                double p[6] = {pts[pi], pts[pi + 1], pts[pi + 2],
                               pts[pi + 3], pts[pi + 4], pts[pi + 5]};
                e.emit(TAG_CUBIC, p, 3);
                pi += 6;
                break;
            }
            case CLOSE: {
                if (e.nsub_segs > 0) {
                    e.end_subpath(true);
                }
                e.cur_x = e.first_x;
                e.cur_y = e.first_y;
                break;
            }
        }
    }
    e.end_subpath(close_subpaths != 0);
    if (e.nsub_segs > 0) {
        out_tags[e.last_tag_idx] |= TAG_END_BIT;
    }
    out_counts[0] = e.n_tags;
    out_counts[1] = e.n_data;
    return e.n_segments;
}

// Encode pre-flattened closed polygons (stroke expansion output): polys is
// a concatenated (sum_n, 2) float array; sizes gives each polygon's point
// count. Every polygon becomes moveto + linetos + close.
int vn_encode_polygons(const float* polys, const int* sizes, int n_polys,
                       uint8_t* out_tags, float* out_data, int* out_counts) {
    Enc e{out_tags, out_data};
    int pi = 0;
    for (int k = 0; k < n_polys; k++) {
        int n = sizes[k];
        if (n >= 2) {
            e.end_subpath(true);
            e.first_x = polys[pi];
            e.first_y = polys[pi + 1];
            e.cur_x = e.first_x;
            e.cur_y = e.first_y;
            e.push_pt(e.first_x, e.first_y);
            e.start_in_data = true;
            e.nsub_segs = 0;
            for (int j = 1; j < n; j++) {
                double p[2] = {polys[pi + 2 * j], polys[pi + 2 * j + 1]};
                e.emit(TAG_LINE, p, 1);
            }
            if (e.nsub_segs > 0) {
                e.end_subpath(true);
                e.cur_x = e.first_x;
                e.cur_y = e.first_y;
            }
        }
        pi += 2 * n;
    }
    e.end_subpath(true);
    out_counts[0] = e.n_tags;
    out_counts[1] = e.n_data;
    return e.n_segments;
}

}  // extern "C"
