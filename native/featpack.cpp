// featpack: memory-mapped packed video-feature store with parallel batch
// gather.
//
// The reference's input pipeline re-opens one .npy per sample inside
// DataLoader workers (grounding/dataset/charades_pair_aug.py:87-88) — tens
// of thousands of file opens per epoch. Here an offline tool
// (tools/featpack.py) pools every video once into a single contiguous
// [num_videos, T, D] float32/float16 blob + index; this library mmaps the
// blob and assembles training batches with an OpenMP parallel gather
// (optionally converting f16 -> f32 during the copy), so batch assembly is
// a handful of page-warm memcpys instead of per-sample Python I/O.
//
// C ABI (ctypes-friendly):
//   fp_open(path, &handle)            -> 0 on success
//   fp_meta(handle, &n, &T, &D, &dt)  -> dims + dtype (0=f32, 1=f16)
//   fp_gather(handle, idx, B, out)    -> out[B*T*D] float32
//   fp_close(handle)

#include <cstdint>
#include <cstdio>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

#pragma pack(push, 1)
struct PackHeader {
  char magic[8];       // "FEATPAK1"
  uint32_t num_videos;
  uint32_t t;          // fixed sample length
  uint32_t d;          // feature dim
  uint32_t dtype;      // 0 = float32, 1 = float16
  uint64_t reserved;
};
#pragma pack(pop)

struct Pack {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  PackHeader header{};
  const uint8_t* data = nullptr;  // feature payload
  size_t video_bytes = 0;
};

inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t mant = h & 0x3ffu;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while (!(mant & 0x400u)) {
        mant <<= 1;
        exp--;
      }
      mant &= 0x3ffu;
      bits = sign | (exp << 23) | (mant << 13);
    }
  } else if (exp == 0x1f) {
    bits = sign | 0x7f800000u | (mant << 13);
  } else {
    bits = sign | ((exp + 127 - 15) << 23) | (mant << 13);
  }
  float out;
  std::memcpy(&out, &bits, sizeof(out));
  return out;
}

}  // namespace

extern "C" {

int fp_open(const char* path, void** handle_out) {
  Pack* p = new Pack();
  p->fd = ::open(path, O_RDONLY);
  if (p->fd < 0) {
    delete p;
    return -1;
  }
  struct stat st;
  if (fstat(p->fd, &st) != 0) {
    ::close(p->fd);
    delete p;
    return -2;
  }
  p->size = (size_t)st.st_size;
  void* m = mmap(nullptr, p->size, PROT_READ, MAP_SHARED, p->fd, 0);
  if (m == MAP_FAILED) {
    ::close(p->fd);
    delete p;
    return -3;
  }
  p->base = (const uint8_t*)m;
  std::memcpy(&p->header, p->base, sizeof(PackHeader));
  if (std::memcmp(p->header.magic, "FEATPAK1", 8) != 0) {
    munmap(m, p->size);
    ::close(p->fd);
    delete p;
    return -4;
  }
  p->data = p->base + sizeof(PackHeader);
  size_t elem = p->header.dtype == 1 ? 2 : 4;
  p->video_bytes = (size_t)p->header.t * p->header.d * elem;
  *handle_out = p;
  return 0;
}

int fp_meta(void* handle, uint32_t* num_videos, uint32_t* t, uint32_t* d,
            uint32_t* dtype) {
  Pack* p = (Pack*)handle;
  *num_videos = p->header.num_videos;
  *t = p->header.t;
  *d = p->header.d;
  *dtype = p->header.dtype;
  return 0;
}

// Gather B videos' pooled features into out[B, T, D] float32.
int fp_gather(void* handle, const int64_t* indices, int64_t batch,
              float* out) {
  Pack* p = (Pack*)handle;
  const size_t td = (size_t)p->header.t * p->header.d;
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < batch; ++b) {
    int64_t idx = indices[b];
    if (idx < 0 || (uint32_t)idx >= p->header.num_videos) {
      std::memset(out + b * td, 0, td * sizeof(float));
      continue;
    }
    const uint8_t* src = p->data + (size_t)idx * p->video_bytes;
    float* dst = out + b * td;
    if (p->header.dtype == 0) {
      std::memcpy(dst, src, td * sizeof(float));
    } else {
      const uint16_t* hsrc = (const uint16_t*)src;
      for (size_t i = 0; i < td; ++i) dst[i] = half_to_float(hsrc[i]);
    }
  }
  return 0;
}

// Gather B videos' features into out[B, T, D] in the pack's STORED dtype
// (f16 stays f16) — a pure parallel memcpy. Used for the raw host->device
// path: shipping f16 halves H2D bytes and the cast runs on device.
int fp_gather_raw(void* handle, const int64_t* indices, int64_t batch,
                  void* out) {
  Pack* p = (Pack*)handle;
  const size_t vb = p->video_bytes;
  uint8_t* out8 = (uint8_t*)out;
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < batch; ++b) {
    int64_t idx = indices[b];
    if (idx < 0 || (uint32_t)idx >= p->header.num_videos) {
      std::memset(out8 + (size_t)b * vb, 0, vb);
      continue;
    }
    std::memcpy(out8 + (size_t)b * vb, p->data + (size_t)idx * vb, vb);
  }
  return 0;
}

int fp_close(void* handle) {
  Pack* p = (Pack*)handle;
  if (p->base) munmap((void*)p->base, p->size);
  if (p->fd >= 0) ::close(p->fd);
  delete p;
  return 0;
}

}  // extern "C"
