// Native host-side data-loading kernels for mp2p_icp_tpu.
//
// The reference stack is C++ end-to-end; in this framework the device
// compute path is JAX/XLA, and the host runtime keeps native code where it
// actually pays: feeding the device. numpy's text parsing (np.loadtxt) is
// ~50x slower than a tight strtof loop for the ASCII .xyz/.txt point files
// the reference tooling exchanges (load_xyz_file.cpp, txt2mm/mm2txt).
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 dependency).
//
// Build: make -C native  (emits libfastload.so next to this file)

#include <cstddef>
#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

// Parse whitespace-separated floats from `buf[0..len)` into `out`
// (row-major), up to max_vals values. Returns the number of values parsed.
// Handles \n, \r, \t, spaces and comment lines starting with '#'.
int64_t parse_floats(
    const char* buf, int64_t len, float* out, int64_t max_vals)
{
    const char* p   = buf;
    const char* end = buf + len;
    int64_t     n   = 0;
    while (p < end && n < max_vals)
    {
        // skip whitespace
        while (p < end &&
               (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t' ||
                *p == ','))
            ++p;
        if (p >= end) break;
        if (*p == '#')
        {  // comment: skip to end of line
            while (p < end && *p != '\n') ++p;
            continue;
        }
        char* next = nullptr;
        float v    = strtof(p, &next);
        if (next == p) break;  // no progress: malformed tail
        out[n++] = v;
        p        = next;
    }
    return n;
}

// Count data columns of the first non-comment line (for format detection).
int32_t detect_columns(const char* buf, int64_t len)
{
    const char* p   = buf;
    const char* end = buf + len;
    while (p < end)
    {
        // skip leading whitespace of the line
        while (p < end && (*p == ' ' || *p == '\t')) ++p;
        if (p < end && *p == '#')
        {
            while (p < end && *p != '\n') ++p;
            if (p < end) ++p;
            continue;
        }
        // count strtof successes until newline
        int32_t cols = 0;
        while (p < end && *p != '\n')
        {
            while (p < end && (*p == ' ' || *p == '\t' || *p == ',')) ++p;
            if (p >= end || *p == '\n' || *p == '\r') break;
            char* next = nullptr;
            strtof(p, &next);
            if (next == p) break;
            ++cols;
            p = next;
        }
        return cols;
    }
    return 0;
}

}  // extern "C"
