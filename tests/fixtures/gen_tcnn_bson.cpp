// Generator for the tcnn-layout BSON checkpoint fixtures, written with the
// REAL nlohmann::json (the library the reference uses for json::to_bson in
// NeuralVolume::save_params, /root/reference/core/network.cu:858-877).
// Nothing from instantvnr_tpu is involved: the container encoding comes
// from nlohmann itself, the parameter blob follows tcnn
// Trainer::serialize() ({loss?, n_params, params_binary, params_type,
// step?} with fp16 matrices [out x in] row-major, last layer padded to 16
// rows, then the grid entry-major), and the values are a documented
// deterministic pattern reproduced by tests/test_serializer.py.
//
// Build + run (json.hpp ships inside the tensorflow wheel):
//   g++ -std=c++17 -I $(python -c "import tensorflow, os; print(os.path.join(
//     os.path.dirname(tensorflow.__file__), 'include/external/cudnn_frontend_archive/include/cudnn_frontend/thirdparty'))") \
//     -o /tmp/gen_tcnn_bson tests/fixtures/gen_tcnn_bson.cpp
//   /tmp/gen_tcnn_bson tests/fixtures
#include <nlohmann/json.hpp>

#include <cstdint>
#include <cstring>
#include <fstream>
#include <vector>

using json = nlohmann::json;

// deterministic fp16 values, exactly representable: v(i) = 1 + (h(i)/1024),
// h(i) = (i * 2654435761) mod 1024  ->  half bits 0x3C00 | h(i)
static uint16_t half_bits(uint64_t i) {
  uint32_t h = static_cast<uint32_t>((i * 2654435761ull) & 0xffffffffull) % 1024u;
  return static_cast<uint16_t>(0x3C00u | h);
}

int main(int argc, char** argv) {
  const std::string outdir = argc > 1 ? argv[1] : ".";

  // schema = tests/test_serializer.small_setup(): HashGrid 4 levels x 4
  // features, log2_hashmap_size 12, base_resolution 4; MLP 32 wide x 2
  // hidden; reference optimizer block (example-model.json values)
  const json model = json::parse(R"({
    "encoding": {"base_resolution": 4, "log2_hashmap_size": 12,
                  "n_features_per_level": 4, "n_levels": 4,
                  "otype": "HashGrid", "per_level_scale": 2.0},
    "loss": {"otype": "L1"},
    "network": {"activation": "ReLU", "n_hidden_layers": 2,
                 "n_neurons": 32, "otype": "FullyFusedMLP",
                 "output_activation": "None"},
    "optimizer": {"decay_base": 0.99, "decay_interval": 1000,
                   "decay_start": 2000,
                   "nested": {"beta1": 0.9, "beta2": 0.999,
                               "epsilon": 1e-15, "l2_reg": 1e-06,
                               "learning_rate": 0.005, "otype": "Adam"},
                   "otype": "ExponentialDecay"}
  })");

  // hash-grid level sizes for this schema (tcnn next_multiple(min(res^3,
  // 2^12), 8); res_l = ceil(2^l*base - 1) + 1 = 4, 8, 16, 32):
  // 64 + 512 + 4096 + 4096
  const size_t n_entries = 64 + 512 + 4096 + 4096;
  const size_t n_feat = 4;
  // MLP fp16 matrices [out x in], output layer padded to 16 rows:
  // 32x16 + 32x32 + 16x32
  const size_t n_mlp = 32 * 16 + 32 * 32 + 16 * 32;
  const size_t n_params = n_mlp + n_entries * n_feat;

  std::vector<uint16_t> blob(n_params);
  for (size_t i = 0; i < n_params; ++i) blob[i] = half_bits(i);
  // zero the output layer's 15 pad rows (tcnn pads the 1-wide output to 16
  // rows; their content is unused — zeroing keeps load->save round-trips
  // byte-stable, which the tagged fixture test relies on)
  for (size_t i = 32 * 16 + 32 * 32 + 32; i < n_mlp; ++i) blob[i] = 0;
  std::vector<uint8_t> blob_bytes(n_params * 2);
  std::memcpy(blob_bytes.data(), blob.data(), blob_bytes.size());

  // macrocell: 32^3 volume, 16^3 cells -> 2x2x2; stored value ranges carry
  // the reference's (-1, +1) offset (macrocell.cu:34-39); pattern:
  // stored lo = 0.125*c - 1, stored hi = 0.125*c + 1 (exact in f32)
  const int mc_n = 2 * 2 * 2;
  std::vector<float> ranges(2 * mc_n);
  for (int c = 0; c < mc_n; ++c) {
    ranges[2 * c + 0] = 0.125f * c - 1.0f;
    ranges[2 * c + 1] = 0.125f * c + 1.0f;
  }
  std::vector<uint8_t> mc_bytes(ranges.size() * 4);
  std::memcpy(mc_bytes.data(), ranges.data(), mc_bytes.size());

  json root;
  root["volume"] = {{"dims", {{"x", 32}, {"y", 32}, {"z", 32}}}};
  root["macrocell"] = {
      {"groundtruth", false},
      {"dims", {{"x", 2}, {"y", 2}, {"z", 2}}},
      {"spacings", {{"x", 0.5}, {"y", 0.5}, {"z", 0.5}}},
      {"data", json::binary(mc_bytes)},
  };
  root["parameters"] = {
      {"n_params", n_params},
      {"params_binary", json::binary(blob_bytes)},
      {"params_type", "__half"},
  };
  root["model"] = model;

  {  // pristine: exactly what the CUDA reference writes
    const auto b = json::to_bson(root);
    std::ofstream ofs(outdir + "/tcnn_checkpoint_pristine.bson",
                      std::ios::binary);
    ofs.write(reinterpret_cast<const char*>(b.data()), b.size());
  }
  {  // tagged: with the step/loss extras our writer adds (tcnn's
     // deserialize ignores unknown keys)
    root["parameters"]["loss"] = 0.125;
    root["parameters"]["step"] = 3;
    const auto b = json::to_bson(root);
    std::ofstream ofs(outdir + "/tcnn_checkpoint_tagged.bson",
                      std::ios::binary);
    ofs.write(reinterpret_cast<const char*>(b.data()), b.size());
  }
  return 0;
}
