// Threaded, mmap-backed safetensors latent-shard reader.
//
// Replaces the reference's per-item python loop (img_latent_dataset.py:76-90:
// safe_open + get_slice per __getitem__ across DataLoader workers) with a
// native batch assembler: shards are mmapped once, batches are gathered by a
// thread pool doing memcpy + CHW->HWC transpose + channel normalization
// directly into the caller's output buffer. This is the host-side hot path
// feeding the TPU during DiT training (global batch 1024 latents/step).
//
// Exposed C ABI (consumed via ctypes from vavae_tpu/data/native_loader.py):
//   shard_reader_create(paths, n)            -> handle
//   shard_reader_len(handle)                 -> total rows
//   shard_reader_shape(handle, dims[3])      -> C,H,W of one latent
//   shard_reader_batch(handle, idx, flip, B, mean, std, mult, out, labels)
//   shard_reader_destroy(handle)
//
// Supports F32 latents and I64/I32 labels (what the pipelines write).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct TensorInfo {
  std::string dtype;
  std::vector<int64_t> shape;
  size_t begin = 0, end = 0;
  bool valid = false;
};

struct Shard {
  void *map = nullptr;
  size_t map_size = 0;
  const uint8_t *data = nullptr;  // start of the data section
  TensorInfo latents, latents_flip, labels;
  int64_t rows = 0;
};

struct Reader {
  std::vector<Shard> shards;
  // global row -> (shard, local row)
  std::vector<std::pair<int32_t, int32_t>> index;
  int64_t C = 0, H = 0, W = 0;
};

// --- minimal JSON scanning for the safetensors header -----------------------

// Finds "name":{...} at top level and extracts dtype/shape/data_offsets.
bool parse_tensor(const std::string &hdr, const std::string &name, TensorInfo *out) {
  std::string key = "\"" + name + "\":";
  size_t pos = 0;
  while (true) {
    pos = hdr.find(key, pos);
    if (pos == std::string::npos) return false;
    // reject longer names that merely end with `name` (e.g. latents_flip
    // when searching latents): the char before '"' must be '{' or ','
    if (pos > 0 && hdr[pos - 1] != '{' && hdr[pos - 1] != ',') { pos += key.size(); continue; }
    break;
  }
  size_t obj = hdr.find('{', pos);
  size_t close = hdr.find('}', obj);
  if (obj == std::string::npos || close == std::string::npos) return false;
  std::string body = hdr.substr(obj + 1, close - obj - 1);

  size_t dt = body.find("\"dtype\"");
  if (dt == std::string::npos) return false;
  size_t q1 = body.find('"', body.find(':', dt));
  size_t q2 = body.find('"', q1 + 1);
  out->dtype = body.substr(q1 + 1, q2 - q1 - 1);

  size_t sh = body.find("\"shape\"");
  if (sh == std::string::npos) return false;
  size_t lb = body.find('[', sh), rb = body.find(']', lb);
  out->shape.clear();
  {
    std::string nums = body.substr(lb + 1, rb - lb - 1);
    const char *p = nums.c_str();
    while (*p) {
      char *endp;
      long long v = strtoll(p, &endp, 10);
      if (endp == p) break;
      out->shape.push_back(v);
      p = endp;
      while (*p == ',' || *p == ' ') ++p;
    }
  }

  size_t off = body.find("\"data_offsets\"");
  if (off == std::string::npos) return false;
  lb = body.find('[', off); rb = body.find(']', lb);
  {
    std::string nums = body.substr(lb + 1, rb - lb - 1);
    const char *p = nums.c_str();
    char *endp;
    out->begin = strtoull(p, &endp, 10);
    p = endp; while (*p == ',' || *p == ' ') ++p;
    out->end = strtoull(p, &endp, 10);
  }
  out->valid = true;
  return true;
}

bool open_shard(const char *path, Shard *s) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return false; }
  void *map = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  close(fd);
  if (map == MAP_FAILED) return false;
  const uint8_t *base = static_cast<const uint8_t *>(map);
  uint64_t hdr_len;
  memcpy(&hdr_len, base, 8);
  if (8 + hdr_len > static_cast<uint64_t>(st.st_size)) { munmap(map, st.st_size); return false; }
  std::string hdr(reinterpret_cast<const char *>(base + 8), hdr_len);
  s->map = map;
  s->map_size = st.st_size;
  s->data = base + 8 + hdr_len;
  const size_t data_size = st.st_size - 8 - hdr_len;
  // Every failure past this point must unmap: the caller only cleans up
  // shards it has already accepted into its list.
  auto fail = [&]() { munmap(map, st.st_size); s->map = nullptr; return false; };
  if (!parse_tensor(hdr, "latents", &s->latents) ||
      !parse_tensor(hdr, "labels", &s->labels))
    return fail();
  parse_tensor(hdr, "latents_flip", &s->latents_flip);  // optional
  s->rows = s->latents.shape.empty() ? 0 : s->latents.shape[0];
  if (s->latents.dtype != "F32" || s->rows <= 0 || s->latents.shape.size() != 4)
    return fail();
  // Unsupported label dtypes must fail LOUDLY here — label_at would otherwise
  // silently return 0 and the whole dataset trains as class 0.
  size_t label_size;
  if (s->labels.dtype == "I64") label_size = 8;
  else if (s->labels.dtype == "I32" || s->labels.dtype == "F32") label_size = 4;
  else return fail();
  // labels are indexed by LATENTS row count — a shorter labels tensor would
  // read adjacent mmap bytes as classes
  if (s->labels.end - s->labels.begin < label_size * (size_t)s->rows)
    return fail();
  // Offsets must lie inside the data section (guards OOB reads on a
  // truncated/corrupt file).
  auto in_bounds = [&](const TensorInfo &ti) {
    return ti.begin <= ti.end && ti.end <= data_size;
  };
  if (!in_bounds(s->latents) || !in_bounds(s->labels) ||
      (s->latents_flip.valid && !in_bounds(s->latents_flip)))
    return fail();
  const size_t item_bytes =
      4ull * s->latents.shape[1] * s->latents.shape[2] * s->latents.shape[3];
  if (s->latents.end - s->latents.begin < item_bytes * (size_t)s->rows)
    return fail();
  if (s->latents_flip.valid &&
      s->latents_flip.end - s->latents_flip.begin < item_bytes * (size_t)s->rows)
    s->latents_flip.valid = false;  // malformed flip tensor: ignore, don't read OOB
  return true;
}

inline int64_t label_at(const Shard &s, int64_t row) {
  const uint8_t *p = s.data + s.labels.begin;
  if (s.labels.dtype == "I64") return reinterpret_cast<const int64_t *>(p)[row];
  if (s.labels.dtype == "I32") return reinterpret_cast<const int32_t *>(p)[row];
  if (s.labels.dtype == "F32") return (int64_t) reinterpret_cast<const float *>(p)[row];
  return 0;
}

}  // namespace

extern "C" {

// Bump when the library's validation/behavior contract changes; the python
// binding refuses an .so whose ABI predates what it was written against
// (mtime-based staleness can't be trusted across checkouts).
int shard_reader_abi_version() { return 2; }

void *shard_reader_create(const char **paths, int n_paths) {
  auto *r = new Reader();
  for (int i = 0; i < n_paths; ++i) {
    Shard s;
    if (!open_shard(paths[i], &s)) {
      for (auto &sh : r->shards) munmap(sh.map, sh.map_size);
      delete r;
      return nullptr;
    }
    if (r->C == 0) {
      r->C = s.latents.shape[1];
      r->H = s.latents.shape[2];
      r->W = s.latents.shape[3];
    } else if (s.latents.shape[1] != r->C || s.latents.shape[2] != r->H ||
               s.latents.shape[3] != r->W) {
      // Mixed-shape shards (e.g. two extraction runs in one dir) would be
      // gathered with shard-0 strides — garbage latents / OOB reads.
      munmap(s.map, s.map_size);
      for (auto &sh : r->shards) munmap(sh.map, sh.map_size);
      delete r;
      return nullptr;
    }
    int shard_id = static_cast<int>(r->shards.size());
    for (int64_t row = 0; row < s.rows; ++row)
      r->index.emplace_back(shard_id, static_cast<int32_t>(row));
    r->shards.push_back(s);
  }
  if (r->index.empty()) { delete r; return nullptr; }
  return r;
}

int64_t shard_reader_len(void *h) {
  return static_cast<Reader *>(h)->index.size();
}

void shard_reader_shape(void *h, int64_t *dims) {
  auto *r = static_cast<Reader *>(h);
  dims[0] = r->C; dims[1] = r->H; dims[2] = r->W;
}

// out: (B, H, W, C) float32 normalized; labels: (B,) int32
// mean/std: per-channel (C,) arrays; flip[i] selects latents_flip.
int shard_reader_batch(void *h, const int64_t *indices, const uint8_t *flip,
                       int batch, const float *mean, const float *std_,
                       float multiplier, float *out, int32_t *labels) {
  auto *r = static_cast<Reader *>(h);
  const int64_t C = r->C, H = r->H, W = r->W;
  const int64_t item = C * H * W;

  int n_threads = std::min<int>(batch, std::max(1u, std::thread::hardware_concurrency()));
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&, t]() {
      std::vector<float> inv_std(C);
      for (int64_t c = 0; c < C; ++c) inv_std[c] = multiplier / std_[c];
      for (int b = t; b < batch; b += n_threads) {
        auto [shard_id, row] = r->index[indices[b]];
        const Shard &s = r->shards[shard_id];
        const TensorInfo &ti =
            (flip && flip[b] && s.latents_flip.valid) ? s.latents_flip : s.latents;
        const float *src = reinterpret_cast<const float *>(s.data + ti.begin) +
                           static_cast<int64_t>(row) * item;
        float *dst = out + static_cast<int64_t>(b) * item;
        // CHW -> HWC with fused normalization
        for (int64_t c = 0; c < C; ++c) {
          const float m = mean[c], is = inv_std[c];
          const float *sc = src + c * H * W;
          for (int64_t hw = 0; hw < H * W; ++hw)
            dst[hw * C + c] = (sc[hw] - m) * is;
        }
        labels[b] = static_cast<int32_t>(label_at(s, row));
      }
    });
  }
  for (auto &th : pool) th.join();
  return 0;
}

void shard_reader_destroy(void *h) {
  auto *r = static_cast<Reader *>(h);
  for (auto &s : r->shards) munmap(s.map, s.map_size);
  delete r;
}

}  // extern "C"
