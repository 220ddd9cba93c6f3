// Native offline noise-injection engine: threaded wav read -> SNR-matched
// mix -> wav write over a whole manifest tree.
//
// The reference's preprocessing drivers (add_noise_to_audio.py:14-43,
// add_real_noise_to_audio.py:129-160) walk the corpus serially in Python;
// a full root1 grid is 5 noise types x 4 SNRs x ~5.5k clips of wav IO. This
// engine processes files across a thread pool with the same mixing math
// (white: noise_power = signal_power / 10^(SNR/10); real: scale bank noise
// to the target power; both peak-normalize when |noisy| > 1).
//
// RNG note: white noise uses std::mt19937_64 + std::normal_distribution per
// file (seeded by the caller), which is deterministic for the native engine
// but NOT bit-identical to numpy's PCG64/ziggurat draws — the numpy path in
// audio/cli.py stays the reference-exact engine; this one is SNR-exact.
//
// Wav support: RIFF PCM16/PCM32/IEEE-float32, any channel count (downmixed
// to mono by mean, like the Python path). Output is 16-bit PCM mono.
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cerrno>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <sys/stat.h>

namespace {

struct WavData {
  std::vector<double> samples;  // mono, [-1, 1]
  int sample_rate = 0;
};

bool read_wav_mono(const char* path, WavData* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  char riff[12];
  if (fread(riff, 1, 12, f) != 12 || memcmp(riff, "RIFF", 4) != 0 ||
      memcmp(riff + 8, "WAVE", 4) != 0) {
    fclose(f);
    return false;
  }
  uint16_t audio_format = 0, n_channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  std::vector<uint8_t> data;
  bool have_fmt = false, have_data = false;
  constexpr uint32_t kMaxChunk = 1u << 30;  // corrupt-size guard (1 GB)
  for (;;) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) break;
    if (size > kMaxChunk) break;  // declared size is garbage
    if (memcmp(id, "fmt ", 4) == 0) {
      if (size < 16) break;  // canonical fmt chunk is >= 16 bytes
      std::vector<uint8_t> fmt(size);
      if (fread(fmt.data(), 1, size, f) != size) break;
      memcpy(&audio_format, fmt.data() + 0, 2);
      memcpy(&n_channels, fmt.data() + 2, 2);
      memcpy(&sample_rate, fmt.data() + 4, 4);
      memcpy(&bits, fmt.data() + 14, 2);
      have_fmt = true;
    } else if (memcmp(id, "data", 4) == 0) {
      data.resize(size);
      if (fread(data.data(), 1, size, f) != size) break;
      have_data = true;
    } else {
      fseek(f, (size + 1) & ~1u, SEEK_CUR);  // chunks are word-aligned
      continue;
    }
    if (have_fmt && have_data) break;
  }
  fclose(f);
  if (!have_fmt || !have_data || n_channels == 0) return false;

  size_t bytes_per = bits / 8;
  if (bytes_per == 0) return false;
  size_t n_frames = data.size() / (bytes_per * n_channels);
  out->samples.assign(n_frames, 0.0);
  out->sample_rate = static_cast<int>(sample_rate);
  const uint8_t* p = data.data();
  for (size_t i = 0; i < n_frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < n_channels; ++c) {
      const uint8_t* s = p + (i * n_channels + c) * bytes_per;
      double v;
      if (audio_format == 3 && bits == 32) {  // IEEE float
        float fv;
        memcpy(&fv, s, 4);
        v = fv;
      } else if (bits == 16) {
        int16_t iv;
        memcpy(&iv, s, 2);
        v = iv / 32768.0;
      } else if (bits == 32) {
        int32_t iv;
        memcpy(&iv, s, 4);
        v = iv / 2147483648.0;
      } else if (bits == 8) {
        v = (static_cast<int>(*s) - 128) / 128.0;
      } else {
        return false;
      }
      acc += v;
    }
    out->samples[i] = acc / n_channels;
  }
  return true;
}

bool make_parent_dirs(const std::string& path) {
  size_t pos = 0;
  while ((pos = path.find('/', pos + 1)) != std::string::npos) {
    std::string dir = path.substr(0, pos);
    if (dir.empty()) continue;
    if (mkdir(dir.c_str(), 0755) != 0 && errno != EEXIST) return false;
  }
  return true;
}

bool write_wav_pcm16(const char* path, const std::vector<double>& samples,
                     int sample_rate) {
  if (!make_parent_dirs(path)) return false;
  FILE* f = fopen(path, "wb");
  if (!f) return false;
  uint32_t data_bytes = static_cast<uint32_t>(samples.size() * 2);
  uint32_t riff_size = 36 + data_bytes;
  uint32_t byte_rate = sample_rate * 2;
  uint16_t block_align = 2, bits = 16, fmt_tag = 1, channels = 1;
  uint32_t fmt_size = 16, sr = static_cast<uint32_t>(sample_rate);
  bool ok = fwrite("RIFF", 1, 4, f) == 4 && fwrite(&riff_size, 4, 1, f) == 1 &&
            fwrite("WAVEfmt ", 1, 8, f) == 8 && fwrite(&fmt_size, 4, 1, f) == 1 &&
            fwrite(&fmt_tag, 2, 1, f) == 1 && fwrite(&channels, 2, 1, f) == 1 &&
            fwrite(&sr, 4, 1, f) == 1 && fwrite(&byte_rate, 4, 1, f) == 1 &&
            fwrite(&block_align, 2, 1, f) == 1 && fwrite(&bits, 2, 1, f) == 1 &&
            fwrite("data", 1, 4, f) == 4 && fwrite(&data_bytes, 4, 1, f) == 1;
  std::vector<int16_t> pcm(samples.size());
  for (size_t i = 0; i < samples.size(); ++i) {
    double v = samples[i];
    if (v > 1.0) v = 1.0;
    if (v < -1.0) v = -1.0;
    pcm[i] = static_cast<int16_t>(lrint(v * 32767.0));
  }
  ok = ok && fwrite(pcm.data(), 2, pcm.size(), f) == pcm.size();
  fclose(f);
  return ok;
}

void mix_and_normalize(std::vector<double>* audio,
                       const std::vector<double>& noise) {
  double peak = 0.0;
  for (size_t i = 0; i < audio->size(); ++i) {
    (*audio)[i] += noise[i];
    double a = std::fabs((*audio)[i]);
    if (a > peak) peak = a;
  }
  if (peak > 1.0) {
    for (auto& v : *audio) v /= peak;
  }
}

}  // namespace

extern "C" {

// Injects noise into n_files clips in parallel.
//   in_paths/out_paths: NUL-terminated path arrays
//   snr_db: target SNR
//   noise_bank/offsets/lens: concatenated mono noise signals (real mode);
//     pass noise_bank == nullptr for white-only runs
//   noise_idx: per-file bank index, or -1 for white noise        (n_files)
//   seeds: per-file RNG seeds for white noise                    (n_files)
//   statuses out: 0 ok, 1 read error, 2 write error              (n_files)
// Returns the number of failed files.
int64_t inject_files(const char** in_paths, const char** out_paths,
                     int64_t n_files, double snr_db, const float* noise_bank,
                     const int64_t* noise_offsets, const int64_t* noise_lens,
                     const int32_t* noise_idx, const uint64_t* seeds,
                     int32_t* statuses, int32_t n_threads) {
  if (n_threads <= 0) n_threads = 1;
  std::atomic<int64_t> next(0);
  std::atomic<int64_t> failures(0);
  const double snr_lin = std::pow(10.0, snr_db / 10.0);

  auto worker = [&]() {
    std::vector<double> noise;
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n_files) break;
      WavData wav;
      if (!read_wav_mono(in_paths[i], &wav) || wav.samples.empty()) {
        statuses[i] = 1;
        failures.fetch_add(1);
        continue;
      }
      const size_t n = wav.samples.size();
      double signal_power = 0.0;
      for (double v : wav.samples) signal_power += v * v;
      signal_power /= n;
      const double target_power = signal_power / snr_lin;

      noise.assign(n, 0.0);
      const int32_t bank = noise_idx ? noise_idx[i] : -1;
      if (bank < 0 || noise_bank == nullptr) {
        std::mt19937_64 gen(seeds ? seeds[i] : 42);
        std::normal_distribution<double> dist(0.0, std::sqrt(target_power));
        for (size_t t = 0; t < n; ++t) noise[t] = dist(gen);
      } else {
        const float* src = noise_bank + noise_offsets[bank];
        const int64_t len = noise_lens[bank];
        if (len <= 0) {  // empty bank entry: modulo below would SIGFPE
          statuses[i] = 1;
          failures.fetch_add(1);
          continue;
        }
        double noise_power = 0.0;
        for (size_t t = 0; t < n; ++t) {
          noise[t] = src[t % len];  // tile from 0, like tile_noise_np
          noise_power += noise[t] * noise[t];
        }
        noise_power /= n;
        if (noise_power > 0.0) {
          const double scale = std::sqrt(target_power / noise_power);
          for (auto& v : noise) v *= scale;
        }
      }
      mix_and_normalize(&wav.samples, noise);
      if (!write_wav_pcm16(out_paths[i], wav.samples, wav.sample_rate)) {
        statuses[i] = 2;
        failures.fetch_add(1);
        continue;
      }
      statuses[i] = 0;
    }
  };

  if (n_threads == 1 || n_files < 2) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return failures.load();
}

}  // extern "C"
