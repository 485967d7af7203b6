// Fast trajectory frame scanner: mmap + structural msgpack walk.
//
// Native counterpart of the reference's C++ TrajectoryReader index build
// (src/core/trajectory_reader.cpp:78-124): locate every top-level msgpack
// object in a trajectory file, record byte offsets, and pull the "time"
// field out of frame maps — without decoding payloads. A multi-GB trajectory
// indexes at memory-bandwidth speed; the Python layer then seeks directly.
//
// The walker implements the public msgpack wire format (msgpack.org spec):
// fixint/fixmap/fixarray/fixstr, nil/bool, bin/ext 8/16/32, float 32/64,
// uint/int 8-64, str 8/16/32, array/map 16/32.
//
// Build:  g++ -O3 -std=c++17 -shared -fPIC trajscan.cpp -o libtrajscan.so

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Cursor {
    const uint8_t *p;
    const uint8_t *end;
    bool ok = true;

    bool need(size_t n) {
        if (static_cast<size_t>(end - p) < n) {
            ok = false;
            return false;
        }
        return true;
    }
    uint64_t be(size_t n) {  // big-endian read
        uint64_t v = 0;
        for (size_t i = 0; i < n; ++i)
            v = (v << 8) | p[i];
        p += n;
        return v;
    }
};

double read_f64(Cursor &c) {
    uint64_t bits = c.be(8);
    double d;
    std::memcpy(&d, &bits, 8);
    return d;
}

// Skip one msgpack object. Returns false on malformed/truncated input.
bool skip(Cursor &c);

bool skip_n(Cursor &c, uint64_t n) {
    for (uint64_t i = 0; i < n; ++i)
        if (!skip(c))
            return false;
    return true;
}

bool skip(Cursor &c) {
    if (!c.need(1))
        return false;
    uint8_t t = *c.p++;
    if (t <= 0x7f || t >= 0xe0)  // pos/neg fixint
        return true;
    if (t >= 0x80 && t <= 0x8f)  // fixmap
        return skip_n(c, 2 * (t & 0x0f));
    if (t >= 0x90 && t <= 0x9f)  // fixarray
        return skip_n(c, t & 0x0f);
    if (t >= 0xa0 && t <= 0xbf) {  // fixstr
        size_t n = t & 0x1f;
        if (!c.need(n)) return false;
        c.p += n;
        return true;
    }
    switch (t) {
    case 0xc0: case 0xc2: case 0xc3: return true;             // nil, bool
    case 0xc4: case 0xd9: { if (!c.need(1)) return false; uint64_t n = c.be(1); if (!c.need(n)) return false; c.p += n; return true; }
    case 0xc5: case 0xda: { if (!c.need(2)) return false; uint64_t n = c.be(2); if (!c.need(n)) return false; c.p += n; return true; }
    case 0xc6: case 0xdb: { if (!c.need(4)) return false; uint64_t n = c.be(4); if (!c.need(n)) return false; c.p += n; return true; }
    case 0xc7: { if (!c.need(2)) return false; uint64_t n = c.be(1); c.p += 1; if (!c.need(n)) return false; c.p += n; return true; }  // ext8
    case 0xc8: { if (!c.need(3)) return false; uint64_t n = c.be(2); c.p += 1; if (!c.need(n)) return false; c.p += n; return true; }  // ext16
    case 0xc9: { if (!c.need(5)) return false; uint64_t n = c.be(4); c.p += 1; if (!c.need(n)) return false; c.p += n; return true; }  // ext32
    case 0xca: if (!c.need(4)) return false; c.p += 4; return true;  // f32
    case 0xcb: if (!c.need(8)) return false; c.p += 8; return true;  // f64
    case 0xcc: case 0xd0: if (!c.need(1)) return false; c.p += 1; return true;
    case 0xcd: case 0xd1: if (!c.need(2)) return false; c.p += 2; return true;
    case 0xce: case 0xd2: if (!c.need(4)) return false; c.p += 4; return true;
    case 0xcf: case 0xd3: if (!c.need(8)) return false; c.p += 8; return true;
    case 0xd4: if (!c.need(2)) return false; c.p += 2; return true;  // fixext1
    case 0xd5: if (!c.need(3)) return false; c.p += 3; return true;
    case 0xd6: if (!c.need(5)) return false; c.p += 5; return true;
    case 0xd7: if (!c.need(9)) return false; c.p += 9; return true;
    case 0xd8: if (!c.need(17)) return false; c.p += 17; return true;
    case 0xdc: { if (!c.need(2)) return false; return skip_n(c, c.be(2)); }
    case 0xdd: { if (!c.need(4)) return false; return skip_n(c, c.be(4)); }
    case 0xde: { if (!c.need(2)) return false; return skip_n(c, 2 * c.be(2)); }
    case 0xdf: { if (!c.need(4)) return false; return skip_n(c, 2 * c.be(4)); }
    default: return false;
    }
}

// Read a string header; returns length or -1 and leaves cursor at bytes.
long str_len(Cursor &c) {
    if (!c.need(1))
        return -1;
    uint8_t t = *c.p;
    if (t >= 0xa0 && t <= 0xbf) { c.p++; return t & 0x1f; }
    if (t == 0xd9) { c.p++; if (!c.need(1)) return -1; return (long)c.be(1); }
    if (t == 0xda) { c.p++; if (!c.need(2)) return -1; return (long)c.be(2); }
    if (t == 0xdb) { c.p++; if (!c.need(4)) return -1; return (long)c.be(4); }
    return -1;
}

// Number of map entries if object is a map, else -1 (cursor advanced past header).
long map_len(Cursor &c) {
    if (!c.need(1))
        return -1;
    uint8_t t = *c.p;
    if (t >= 0x80 && t <= 0x8f) { c.p++; return t & 0x0f; }
    if (t == 0xde) { c.p++; if (!c.need(2)) return -1; return (long)c.be(2); }
    if (t == 0xdf) { c.p++; if (!c.need(4)) return -1; return (long)c.be(4); }
    return -1;
}

double read_number(Cursor &c, bool *got) {
    *got = true;
    if (!c.need(1)) { *got = false; return 0; }
    uint8_t t = *c.p;
    if (t == 0xcb) { c.p++; if (!c.need(8)) { *got = false; return 0; } return read_f64(c); }
    if (t == 0xca) {
        c.p++;
        if (!c.need(4)) { *got = false; return 0; }
        uint32_t bits = (uint32_t)c.be(4);
        float f;
        std::memcpy(&f, &bits, 4);
        return (double)f;
    }
    if (t <= 0x7f) { c.p++; return (double)t; }
    if (t == 0xcc) { c.p++; if (!c.need(1)) { *got = false; return 0; } return (double)c.be(1); }
    if (t == 0xcd) { c.p++; if (!c.need(2)) { *got = false; return 0; } return (double)c.be(2); }
    if (t == 0xce) { c.p++; if (!c.need(4)) { *got = false; return 0; } return (double)c.be(4); }
    *got = false;
    skip(c);
    return 0;
}

}  // namespace

extern "C" {

// Scan a trajectory file. Fills offsets[] (byte offset of each frame) and
// times[] (the frame's "time" field, NaN if absent) up to `capacity`.
// header_bytes gets the size of a leading header object (one whose map
// contains "trajversion"), or 0. Returns the number of frames found, or -1
// on I/O error, -2 on malformed msgpack.
long trajscan_scan(const char *path, long *offsets, double *times,
                   long capacity, long *header_bytes) {
    int fd = open(path, O_RDONLY);
    if (fd < 0)
        return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) {
        close(fd);
        return -1;
    }
    size_t size = st.st_size;
    if (size == 0) {
        close(fd);
        *header_bytes = 0;
        return 0;
    }
    void *base = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (base == MAP_FAILED)
        return -1;

    const uint8_t *data = static_cast<const uint8_t *>(base);
    Cursor c{data, data + size};
    *header_bytes = 0;
    long n_frames = 0;
    bool first = true;

    while (c.p < c.end) {
        const uint8_t *obj_start = c.p;
        Cursor probe = c;
        long entries = map_len(probe);
        bool is_header = false;
        double time = 0.0 / 0.0;
        if (entries >= 0) {
            // walk keys; look for "trajversion" (header) or "time" (frame)
            Cursor walk = probe;
            for (long i = 0; i < entries && walk.ok; ++i) {
                Cursor key_probe = walk;
                long klen = str_len(key_probe);
                if (klen >= 0 && key_probe.need(klen)) {
                    const char *k = reinterpret_cast<const char *>(key_probe.p);
                    key_probe.p += klen;
                    Cursor val = key_probe;
                    if (klen == 11 && std::memcmp(k, "trajversion", 11) == 0)
                        is_header = true;
                    if (klen == 4 && std::memcmp(k, "time", 4) == 0) {
                        bool got;
                        Cursor val2 = val;
                        double t = read_number(val2, &got);
                        if (got)
                            time = t;
                    }
                    walk = val;
                    if (!skip(walk)) { walk.ok = false; break; }
                } else {
                    if (!skip(walk)) { walk.ok = false; break; }
                    if (!skip(walk)) { walk.ok = false; break; }
                }
            }
        }
        if (!skip(c)) {
            munmap(base, size);
            return -2;
        }
        if (first && is_header) {
            *header_bytes = (long)(c.p - data);
        } else {
            if (n_frames < capacity) {
                offsets[n_frames] = (long)(obj_start - data);
                times[n_frames] = time;
            }
            n_frames++;
        }
        first = false;
    }
    munmap(base, size);
    return n_frames;
}

}  // extern "C"
