// Native data-loading runtime for speech2lip_tpu.
//
// The reference feeds training from a Python DataLoader whose per-sample work
// is JPEG decode + .npy reads (reference src/data/someones_lip_dataset.py
// load_one_frame, :242-399).  At TPU step times of a few ms, Python/cv2
// decode of a 500x500 JPEG plus a 2MB coord grid per frame becomes the
// bottleneck (and holds the GIL).  This library provides:
//
//   - a libjpeg-based batched JPEG decoder (RGB float32 [0,1], fixed HxW)
//   - a batched raw .npy (float32/uint8, C-order, v1.0) reader
//   - an asynchronous prefetcher: worker threads fill a bounded ring of
//     sample slots (a fixed set of jpeg/npy files per sample) ahead of the
//     consumer; pop blocks until the next IN-ORDER sample is ready.
//
// Exposed as a plain C ABI consumed via ctypes
// (speech2lip_tpu/data/native_loader.py).  Build: tools/build_native.sh.

#include <cstddef>
#include <cstdio>
#include <csetjmp>

#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// JPEG decode
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Decode one JPEG file into float32 RGB [0,1] at its native size; returns
// false on failure. out must hold h*w*3 floats; (h, w) must match the file.
bool decode_jpeg_file(const char* path, float* out, int expect_h,
                      int expect_w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  if (h != expect_h || w != expect_w || cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  std::vector<uint8_t> row(static_cast<size_t>(w) * 3);
  uint8_t* rowp = row.data();
  constexpr float kInv255 = 1.0f / 255.0f;
  while (cinfo.output_scanline < cinfo.output_height) {
    const int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    float* dst = out + static_cast<size_t>(y) * w * 3;
    for (int i = 0; i < w * 3; ++i) dst[i] = rowp[i] * kInv255;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// ---------------------------------------------------------------------------
// Minimal .npy reader (v1.x, little-endian float32/uint8, C-order)
// ---------------------------------------------------------------------------

bool read_npy_f32(const char* path, float* out, int64_t expect_elems) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
    fclose(f);
    return false;
  }
  uint16_t header_len = 0;
  if (fread(&header_len, 2, 1, f) != 1) { fclose(f); return false; }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) {
    fclose(f);
    return false;
  }
  const bool is_f4 = header.find("'<f4'") != std::string::npos;
  const bool fortran = header.find("'fortran_order': True") != std::string::npos;
  if (!is_f4 || fortran) { fclose(f); return false; }
  const size_t n = fread(out, 4, expect_elems, f);
  fclose(f);
  return n == static_cast<size_t>(expect_elems);
}

// ---------------------------------------------------------------------------
// Prefetcher
// ---------------------------------------------------------------------------

struct FileSpec {
  std::string path;
  int kind;        // 0 = jpeg, 1 = npy float32
  int h, w;        // jpeg geometry (kind 0)
  int64_t elems;   // float count for this file's buffer
};

struct Loader {
  std::vector<std::vector<FileSpec>> samples;  // [n_samples][n_files]
  int64_t sample_floats = 0;      // total floats per sample
  int n_slots = 0;

  std::vector<std::vector<float>> slots;
  std::vector<int> slot_sample;    // which sample index occupies the slot
  std::vector<std::atomic<int>> slot_state;  // 0 free, 1 filling, 2 ready

  std::vector<int> order;          // epoch order of sample indices
  std::atomic<size_t> next_fill{0};
  size_t next_pop = 0;

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<bool> stop{false};
  std::atomic<long> errors{0};

  ~Loader() { shutdown(); }

  void shutdown() {
    stop.store(true);
    cv.notify_all();
    for (auto& t : workers) {
      if (t.joinable()) t.join();
    }
    workers.clear();
  }

  bool fill_slot(int slot, int sample_idx) {
    float* dst = slots[slot].data();
    bool ok = true;
    for (const FileSpec& fs : samples[sample_idx]) {
      if (fs.kind == 0) {
        ok = decode_jpeg_file(fs.path.c_str(), dst, fs.h, fs.w) && ok;
      } else {
        ok = read_npy_f32(fs.path.c_str(), dst, fs.elems) && ok;
      }
      dst += fs.elems;
    }
    return ok;
  }

  void worker() {
    while (!stop.load()) {
      const size_t pos = next_fill.fetch_add(1);
      if (pos >= order.size()) return;
      const int slot = static_cast<int>(pos) % n_slots;
      // wait for the slot to be consumed (in-order ring)
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] {
          return stop.load() || slot_state[slot].load() == 0;
        });
        if (stop.load()) return;
        slot_state[slot].store(1);
        slot_sample[slot] = order[pos];
      }
      if (!fill_slot(slot, order[pos])) errors.fetch_add(1);
      slot_state[slot].store(2);
      cv.notify_all();
    }
  }
};

}  // namespace

extern "C" {

// One-shot parallel batch decode: paths are '\n'-joined; out gets
// [n, h, w, 3] float32.  Returns number of failures.
int s2l_decode_jpeg_batch(const char* joined_paths, int n, int h, int w,
                          int n_threads, float* out) {
  std::vector<std::string> paths;
  {
    const char* p = joined_paths;
    for (int i = 0; i < n; ++i) {
      const char* e = strchr(p, '\n');
      paths.emplace_back(p, e ? static_cast<size_t>(e - p) : strlen(p));
      p = e ? e + 1 : p + paths.back().size();
    }
  }
  std::atomic<int> next{0}, failures{0};
  auto work = [&] {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      if (!decode_jpeg_file(paths[i].c_str(),
                            out + static_cast<int64_t>(i) * h * w * 3, h, w))
        failures.fetch_add(1);
    }
  };
  std::vector<std::thread> ts;
  for (int t = 0; t < n_threads; ++t) ts.emplace_back(work);
  for (auto& t : ts) t.join();
  return failures.load();
}

int s2l_read_npy_batch(const char* joined_paths, int n, int64_t elems,
                       int n_threads, float* out) {
  std::vector<std::string> paths;
  {
    const char* p = joined_paths;
    for (int i = 0; i < n; ++i) {
      const char* e = strchr(p, '\n');
      paths.emplace_back(p, e ? static_cast<size_t>(e - p) : strlen(p));
      p = e ? e + 1 : p + paths.back().size();
    }
  }
  std::atomic<int> next{0}, failures{0};
  auto work = [&] {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      if (!read_npy_f32(paths[i].c_str(),
                        out + static_cast<int64_t>(i) * elems, elems))
        failures.fetch_add(1);
    }
  };
  std::vector<std::thread> ts;
  for (int t = 0; t < n_threads; ++t) ts.emplace_back(work);
  for (auto& t : ts) t.join();
  return failures.load();
}

// --- prefetcher ------------------------------------------------------------

void* s2l_loader_create(int n_samples, int files_per_sample,
                        const char* joined_paths, const int* kinds,
                        const int* hs, const int* ws, const int64_t* elems,
                        int n_slots, int n_threads) {
  Loader* L = new Loader();
  const char* p = joined_paths;
  L->samples.resize(n_samples);
  int64_t per_sample = 0;
  for (int j = 0; j < files_per_sample; ++j) per_sample += elems[j];
  L->sample_floats = per_sample;
  for (int i = 0; i < n_samples; ++i) {
    for (int j = 0; j < files_per_sample; ++j) {
      const char* e = strchr(p, '\n');
      FileSpec fs;
      fs.path.assign(p, e ? static_cast<size_t>(e - p) : strlen(p));
      p = e ? e + 1 : p + fs.path.size();
      fs.kind = kinds[j];
      fs.h = hs[j];
      fs.w = ws[j];
      fs.elems = elems[j];
      L->samples[i].push_back(std::move(fs));
    }
  }
  L->n_slots = n_slots;
  L->slots.assign(n_slots, std::vector<float>(per_sample));
  L->slot_sample.assign(n_slots, -1);
  L->slot_state = std::vector<std::atomic<int>>(n_slots);
  for (auto& s : L->slot_state) s.store(0);
  (void)n_threads;
  return L;
}

// Begin an epoch with the given sample order (len n); spawns workers.
void s2l_loader_start(void* handle, const int* order, int n, int n_threads) {
  Loader* L = static_cast<Loader*>(handle);
  L->shutdown();
  L->stop.store(false);
  L->order.assign(order, order + n);
  L->next_fill.store(0);
  L->next_pop = 0;
  for (auto& s : L->slot_state) s.store(0);
  for (int t = 0; t < n_threads; ++t)
    L->workers.emplace_back([L] { L->worker(); });
}

// Blocking pop of the next in-order sample; copies into out
// (sample_floats floats).  Returns the sample index, or -1 at epoch end.
int s2l_loader_pop(void* handle, float* out) {
  Loader* L = static_cast<Loader*>(handle);
  if (L->next_pop >= L->order.size()) return -1;
  const int slot = static_cast<int>(L->next_pop) % L->n_slots;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv.wait(lk, [&] { return L->slot_state[slot].load() == 2; });
  }
  memcpy(out, L->slots[slot].data(), L->sample_floats * sizeof(float));
  const int sample_idx = L->slot_sample[slot];
  L->slot_state[slot].store(0);
  L->cv.notify_all();
  L->next_pop++;
  return sample_idx;
}

long s2l_loader_errors(void* handle) {
  return static_cast<Loader*>(handle)->errors.load();
}

void s2l_loader_destroy(void* handle) {
  delete static_cast<Loader*>(handle);
}

}  // extern "C"
