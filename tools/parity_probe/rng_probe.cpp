// Dumps libstdc++ minstd_rand0 / uniform_int_distribution streams as the
// golden reference for eldorado_tpu.ops.rng (parity target: the exact RNG
// consumed by /root/reference src/environment.cpp:18-22 et al).
//
// Usage: rng_probe <outfile>
// Binary layout (little-endian):
//   u32 n_seeds, u32 n_raw, u32 n_ranges
//   for each seed in SEEDS: u32 seed; u32 raw[n_raw];
//   then for each seed: for each range r in RANGES: u32 n_draws, u32 vals[n_draws]
#include <cstdint>
#include <cstdio>
#include <random>
#include <vector>

int main(int argc, char** argv) {
  if (argc < 2) return 1;
  FILE* f = fopen(argv[1], "wb");
  std::vector<uint32_t> seeds = {0, 1, 2, 42, 12345, 123456, 2147483646u,
                                 2147483647u, 2147483648u, 4294967295u};
  std::vector<uint32_t> ranges = {1, 2, 3, 4, 5, 6, 7, 8, 16, 21, 22, 23,
                                  37, 100, 504, 65536, 2147483645u};
  uint32_t n_seeds = (uint32_t)seeds.size(), n_raw = 64,
           n_ranges = (uint32_t)ranges.size(), n_draws = 16;
  fwrite(&n_seeds, 4, 1, f);
  fwrite(&n_raw, 4, 1, f);
  fwrite(&n_ranges, 4, 1, f);
  fwrite(&n_draws, 4, 1, f);
  for (uint32_t s : seeds) {
    std::default_random_engine eng(s);
    fwrite(&s, 4, 1, f);
    for (uint32_t i = 0; i < n_raw; i++) {
      uint32_t v = (uint32_t)eng();
      fwrite(&v, 4, 1, f);
    }
  }
  for (uint32_t s : seeds) {
    for (uint32_t r : ranges) {
      std::default_random_engine eng(s);
      for (uint32_t i = 0; i < n_draws; i++) {
        std::uniform_int_distribution<size_t> dist(0, (size_t)r - 1);
        uint32_t v = (uint32_t)dist(eng);
        fwrite(&v, 4, 1, f);
      }
    }
  }
  fclose(f);
  return 0;
}
