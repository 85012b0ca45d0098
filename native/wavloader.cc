// Native data-loader runtime for the vocoder training pipeline.
//
// The reference feeds its GAN trainer through torch DataLoader worker
// processes doing python-side soundfile reads + librosa normalisation
// (sr/dataset.py:221-238).  Here the hot host-side path — WAV decode,
// int16 -> float, peak-normalise * 0.95, aligned crop — is a small C++
// library driven from Python via ctypes, with a std::thread pool
// filling whole batches in one call so the TPU step never waits on
// Python byte-shuffling.
//
// Exposed C ABI:
//   wav_info(path, *sr, *n)                 -> sample rate + length
//   wav_load_normalized(path, out, cap)     -> full normalised waveform
//   wav_load_crops(paths, n, starts, crop,  -> [n, crop] batch of crops
//                  out, n_threads)
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libwavloader.so wavloader.cc -lpthread

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct WavData {
  int sr = 0;
  std::vector<float> samples;  // normalised to the reference convention
};

// Remaining bytes from the current position to EOF; 0 on any failure.
// Corrupt/fuzzed headers can declare multi-GB chunk sizes — every chunk
// read must be clamped to what the file actually holds, or a single
// damaged file stalls the loader on a bogus allocation.
long remaining_bytes(FILE* f) {
  long pos = std::ftell(f);
  if (pos < 0 || std::fseek(f, 0, SEEK_END)) return 0;
  long end = std::ftell(f);
  if (end < 0 || std::fseek(f, pos, SEEK_SET)) return 0;
  return end > pos ? end - pos : 0;
}

// Minimal RIFF/WAVE PCM16 reader (mono or averaged multi-channel).
bool read_wav(const char* path, WavData* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  char riff[4], wave[4];
  uint32_t riff_size;
  if (std::fread(riff, 1, 4, f) != 4 || std::memcmp(riff, "RIFF", 4) ||
      std::fread(&riff_size, 4, 1, f) != 1 ||
      std::fread(wave, 1, 4, f) != 4 || std::memcmp(wave, "WAVE", 4)) {
    std::fclose(f);
    return false;
  }
  uint16_t audio_format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  std::vector<int16_t> raw;
  bool have_fmt = false, have_data = false;
  char chunk_id[4];
  uint32_t chunk_size;
  while (std::fread(chunk_id, 1, 4, f) == 4 && std::fread(&chunk_size, 4, 1, f) == 1) {
    long avail = remaining_bytes(f);
    if (static_cast<long>(chunk_size) > avail || static_cast<long>(chunk_size) < 0) {
      chunk_size = static_cast<uint32_t>(avail);  // truncated/corrupt header
    }
    if (!std::memcmp(chunk_id, "fmt ", 4)) {
      if (chunk_size < 16) break;  // PCM fmt chunk is >= 16 bytes
      std::vector<char> fmt(chunk_size);
      if (std::fread(fmt.data(), 1, chunk_size, f) != chunk_size) break;
      std::memcpy(&audio_format, fmt.data() + 0, 2);
      std::memcpy(&channels, fmt.data() + 2, 2);
      std::memcpy(&sample_rate, fmt.data() + 4, 4);
      std::memcpy(&bits, fmt.data() + 14, 2);
      have_fmt = true;
    } else if (!std::memcmp(chunk_id, "data", 4)) {
      raw.resize(chunk_size / 2);
      if (std::fread(raw.data(), 2, chunk_size / 2, f) != chunk_size / 2) break;
      have_data = true;
    } else {
      std::fseek(f, (chunk_size + 1) & ~1u, SEEK_CUR);
      continue;
    }
    if (chunk_size & 1) std::fseek(f, 1, SEEK_CUR);
    if (have_fmt && have_data) break;
  }
  std::fclose(f);
  if (!have_fmt || !have_data || audio_format != 1 || bits != 16 || channels == 0) {
    return false;
  }

  size_t n = raw.size() / channels;
  out->sr = static_cast<int>(sample_rate);
  out->samples.resize(n);
  // int16 -> [-1, 1) -> peak normalise -> * 0.95 (sr/dataset.py:232-233)
  double peak = 0.0;
  for (size_t i = 0; i < n; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) acc += raw[i * channels + c];
    double v = acc / channels / 32768.0;
    out->samples[i] = static_cast<float>(v);
    double a = v < 0 ? -v : v;
    if (a > peak) peak = a;
  }
  if (peak > 0) {
    float scale = static_cast<float>(0.95 / peak);
    for (auto& s : out->samples) s *= scale;
  }
  return true;
}

}  // namespace

extern "C" {

int wav_info(const char* path, int* sr, long* n_samples) {
  // Header-only scan: avoids decoding the payload just to size buffers.
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char id[4];
  uint32_t size;
  if (std::fread(id, 1, 4, f) != 4 || std::memcmp(id, "RIFF", 4) ||
      std::fseek(f, 4, SEEK_CUR) || std::fread(id, 1, 4, f) != 4 ||
      std::memcmp(id, "WAVE", 4)) {
    std::fclose(f);
    return -1;
  }
  uint16_t channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  long data_bytes = -1;
  while (std::fread(id, 1, 4, f) == 4 && std::fread(&size, 4, 1, f) == 1) {
    long avail = remaining_bytes(f);
    if (static_cast<long>(size) > avail || static_cast<long>(size) < 0) {
      size = static_cast<uint32_t>(avail);  // truncated/corrupt header
    }
    if (!std::memcmp(id, "fmt ", 4)) {
      if (size < 16) break;  // PCM fmt chunk is >= 16 bytes
      std::vector<char> fmt(size);
      if (std::fread(fmt.data(), 1, size, f) != size) break;
      std::memcpy(&channels, fmt.data() + 2, 2);
      std::memcpy(&sample_rate, fmt.data() + 4, 4);
      std::memcpy(&bits, fmt.data() + 14, 2);
    } else if (!std::memcmp(id, "data", 4)) {
      data_bytes = size;
      break;
    } else {
      std::fseek(f, (size + 1) & ~1u, SEEK_CUR);
    }
  }
  std::fclose(f);
  if (data_bytes < 0 || channels == 0 || bits != 16) return -1;
  *sr = static_cast<int>(sample_rate);
  *n_samples = data_bytes / 2 / channels;
  return 0;
}

long wav_load_normalized(const char* path, float* out, long capacity, int* sr) {
  WavData w;
  if (!read_wav(path, &w)) return -1;
  long n = static_cast<long>(w.samples.size());
  long m = n < capacity ? n : capacity;
  std::memcpy(out, w.samples.data(), m * sizeof(float));
  *sr = w.sr;
  return n;
}

// Fill out[i*crop_len : (i+1)*crop_len] with the crop of file i starting
// at starts[i], wrapping modulo eff_lens[i] (<=0 means the full file) —
// modulo-tiling reproduces the reference's doubling of short clips
// (sr/dataset.py:255-259), and eff_lens carries the code-aligned trim
// (audio cut to code_length * hop, sr/dataset.py:249).  Zero-fill +
// count failures for unreadable files.
int wav_load_crops(const char** paths, int n_files, const long* starts,
                   const long* eff_lens, long crop_len, float* out,
                   int n_threads) {
  std::atomic<int> next{0};
  std::atomic<int> failures{0};
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n_files) return;
      WavData w;
      float* dst = out + static_cast<long>(i) * crop_len;
      if (!read_wav(paths[i], &w) || w.samples.empty()) {
        std::memset(dst, 0, crop_len * sizeof(float));
        failures.fetch_add(1);
        continue;
      }
      long n = static_cast<long>(w.samples.size());
      if (eff_lens && eff_lens[i] > 0 && eff_lens[i] < n) n = eff_lens[i];
      for (long j = 0; j < crop_len; ++j) {
        long src = (starts[i] + j) % n;
        dst[j] = w.samples[src];
      }
    }
  };
  int threads = n_threads > 0 ? n_threads : 1;
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return failures.load();
}

}  // extern "C"
