// Native GenRef shard reader: fast ustar indexing + batched member reads.
//
// The training input path streams millions of small files out of tar shards
// (`train/data.py`); Python's tarfile walks headers with per-member object
// overhead. This C++ core does one sequential pass with zero allocation per
// member and serves batched pread()s with readahead hints — the host-side
// equivalent of the reference's delegated webdataset/C-extension stack
// (SURVEY.md §2.4). Exposed through a plain C ABI consumed via ctypes
// (`reflectionflow_tpu/utils/native.py`); compiled on demand with g++.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Parse an octal field (tar headers store sizes as ASCII octal).
// Returns -1 for base-256 (binary) encoding — sizes >= 8 GiB — which we do
// not support; callers bail out so Python tarfile handles the shard.
static int64_t parse_octal(const char* p, size_t n) {
    if (n > 0 && (static_cast<unsigned char>(p[0]) & 0x80)) return -1;
    int64_t v = 0;
    for (size_t i = 0; i < n && p[i]; ++i) {
        if (p[i] < '0' || p[i] > '7') continue;
        v = (v << 3) | (p[i] - '0');
    }
    return v;
}

// Parse a PAX extended-header payload for a "path=" record
// (records are "<len> <key>=<value>\n").
static bool pax_find_path(const char* buf, int64_t n, char* out, size_t out_cap) {
    int64_t i = 0;
    while (i < n) {
        // record length prefix (decimal, includes itself)
        int64_t rec_len = 0;
        int64_t j = i;
        while (j < n && buf[j] >= '0' && buf[j] <= '9') {
            rec_len = rec_len * 10 + (buf[j] - '0');
            ++j;
        }
        if (j >= n || buf[j] != ' ' || rec_len <= 0 || i + rec_len > n) return false;
        const char* kv = buf + j + 1;
        int64_t kv_len = rec_len - (j + 1 - i) - 1;  // minus trailing \n
        if (kv_len > 5 && memcmp(kv, "path=", 5) == 0) {
            size_t vlen = static_cast<size_t>(kv_len - 5);
            if (vlen >= out_cap) vlen = out_cap - 1;
            memcpy(out, kv + 5, vlen);
            out[vlen] = 0;
            return true;
        }
        i += rec_len;
    }
    return false;
}

// Index a tar file: writes (offset, size) pairs for regular files and their
// names (NUL-padded rows of `name_stride` bytes). Returns member count, or
// -1 on IO error, -2 if capacity exceeded.
int64_t rf_tar_index(const char* path, int64_t* offsets, int64_t* sizes,
                     char* names, int64_t max_members, int64_t name_stride) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    setvbuf(f, nullptr, _IOFBF, 1 << 20);

    unsigned char hdr[512];
    int64_t count = 0;
    int64_t pos = 0;
    char long_name[4096] = {0};
    bool have_long_name = false;

    while (fread(hdr, 1, 512, f) == 512) {
        pos += 512;
        // end of archive: zero block
        bool all_zero = true;
        for (int i = 0; i < 512; ++i) {
            if (hdr[i]) { all_zero = false; break; }
        }
        if (all_zero) break;

        int64_t size = parse_octal(reinterpret_cast<char*>(hdr + 124), 12);
        if (size < 0) { fclose(f); return -3; }  // base-256: unsupported
        char typeflag = static_cast<char>(hdr[156]);
        int64_t padded = (size + 511) & ~int64_t(511);

        if (typeflag == 'x' || typeflag == 'X') {  // PAX extended header
            if (size > (int64_t)1 << 20) { fclose(f); return -3; }
            char* pax = static_cast<char*>(malloc(static_cast<size_t>(size)));
            if (!pax || fread(pax, 1, static_cast<size_t>(size), f) != static_cast<size_t>(size)) {
                free(pax);
                fclose(f);
                return -1;
            }
            if (pax_find_path(pax, size, long_name, sizeof(long_name))) {
                have_long_name = true;
            }
            free(pax);
            if (fseek(f, static_cast<long>(padded - size), SEEK_CUR) != 0) { fclose(f); return -1; }
            pos += padded;
            continue;
        }
        if (typeflag == 'g') {  // PAX global header: skip payload
            if (fseek(f, static_cast<long>(padded), SEEK_CUR) != 0) { fclose(f); return -1; }
            pos += padded;
            continue;
        }

        if (typeflag == 'L') {  // GNU long name: payload is the next name
            int64_t n = size < 4095 ? size : 4095;
            if (fread(long_name, 1, static_cast<size_t>(n), f) != static_cast<size_t>(n)) {
                fclose(f);
                return -1;
            }
            long_name[n] = 0;
            have_long_name = true;
            if (fseek(f, static_cast<long>(padded - n), SEEK_CUR) != 0) { fclose(f); return -1; }
            pos += padded;
            continue;
        }

        if (typeflag == '0' || typeflag == 0) {  // regular file
            if (count >= max_members) { fclose(f); return -2; }
            offsets[count] = pos;
            sizes[count] = size;
            char* dst = names + count * name_stride;
            memset(dst, 0, static_cast<size_t>(name_stride));
            if (have_long_name) {
                strncpy(dst, long_name, static_cast<size_t>(name_stride - 1));
            } else {
                // ustar: prefix (345, 155 bytes) + '/' + name (0, 100 bytes)
                char name[257] = {0};
                const char* prefix = reinterpret_cast<const char*>(hdr + 345);
                const char* base = reinterpret_cast<const char*>(hdr);
                if (prefix[0]) {
                    snprintf(name, sizeof(name), "%.155s/%.100s", prefix, base);
                } else {
                    snprintf(name, sizeof(name), "%.100s", base);
                }
                strncpy(dst, name, static_cast<size_t>(name_stride - 1));
            }
            ++count;
        }
        have_long_name = false;
        if (fseek(f, static_cast<long>(padded), SEEK_CUR) != 0) { fclose(f); return -1; }
        pos += padded;
    }
    fclose(f);
    return count;
}

// Batched member reads into one caller buffer at the given destination
// offsets. Issues POSIX_FADV_WILLNEED for the whole span first. Returns 0,
// or -1 on IO error.
int32_t rf_tar_read_batch(const char* path, const int64_t* offsets,
                          const int64_t* sizes, int64_t n,
                          uint8_t* out, const int64_t* out_offsets) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
#ifdef POSIX_FADV_WILLNEED
    if (n > 0) {
        int64_t lo = offsets[0], hi = offsets[0] + sizes[0];
        for (int64_t i = 1; i < n; ++i) {
            if (offsets[i] < lo) lo = offsets[i];
            if (offsets[i] + sizes[i] > hi) hi = offsets[i] + sizes[i];
        }
        posix_fadvise(fd, lo, hi - lo, POSIX_FADV_WILLNEED);
    }
#endif
    for (int64_t i = 0; i < n; ++i) {
        int64_t done = 0;
        while (done < sizes[i]) {
            ssize_t r = pread(fd, out + out_offsets[i] + done,
                              static_cast<size_t>(sizes[i] - done), offsets[i] + done);
            if (r <= 0) { close(fd); return -1; }
            done += r;
        }
    }
    close(fd);
    return 0;
}

}  // extern "C"
