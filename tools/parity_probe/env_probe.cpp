// Golden-trajectory prober for the UB-patched reference oracle
// (see make_oracle.py). Two subcommands:
//
//   env_probe mapgen <out.bin> <seed0> <nseeds> <n_players> <n_pieces> <diff>
//     For each seed: env(seed,...) + reset(); dump placed-piece list
//     (library id + transformed float coords) and the 48x48x7 observation.
//
//   env_probe traj <out.bin> <env_seed> <sampler_seed> <n_players> <n_pieces>
//                  <diff> <max_steps> <T> [mask_src]
//     Single-env rollout with the built-in masked random sampler and
//     vec-style auto-reset (reference: include/vec_environment.h:53-61),
//     dumping actions/masks/obs/rewards/infos every step. mask_src selects
//     what the sampler sees: 0 = the selected_action_mask buffer (the
//     pytest/vec API surface, reference pytest/test_vec_env.py:103), 1 = the
//     current agent's per-player obs mask (the C++ doctest surface,
//     src/tests/test_environment.cpp:98).
#include "environment.h"
#include "map.h"
#include "sampler.h"
#include "api.h"
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern std::array<MapPiece, 2> start_pieces;
extern std::array<MapPiece, 16> travel_pieces;
extern std::array<MapPiece, 2> end_pieces;

static int lib_id(const MapPiece* p) {
  if (p >= &start_pieces[0] && p <= &start_pieces[1])
    return (int)(p - &start_pieces[0]);
  if (p >= &travel_pieces[0] && p <= &travel_pieces[15])
    return 2 + (int)(p - &travel_pieces[0]);
  if (p >= &end_pieces[0] && p <= &end_pieces[1])
    return 18 + (int)(p - &end_pieces[0]);
  return -1;
}

static void dump_mask(FILE* f, const ActionMask& m) {
  unsigned char buf[92];
  int k = 0;
  for (auto b : m.play) buf[k++] = b;
  for (auto b : m.play_special) buf[k++] = b;
  for (auto b : m.remove) buf[k++] = b;
  for (auto b : m.move) buf[k++] = b;
  for (auto b : m.get_from_shop) buf[k++] = b;
  fwrite(buf, 1, 92, f);
}

static void dump_piles(FILE* f, const ObsData& obs) {
  for (int p = 0; p < 4; p++) {
    const DeckObs& d = obs.player_data[p].obs;
    fwrite(d.draw.data(), 1, 21, f);
    fwrite(d.hand.data(), 1, 21, f);
    fwrite(d.active.data(), 1, 21, f);
    fwrite(d.played.data(), 1, 21, f);
    fwrite(d.discard.data(), 1, 21, f);
  }
}

static void dump_map_obs(FILE* f, const ObsData& obs) {
  fwrite(obs.shared.map.data(), 1, 48 * 48 * 7, f);
}

int main(int argc, char** argv) {
  if (argc < 3) return 1;
  FILE* f = fopen(argv[2], "wb");
  static ObsData obs;
  static Info info;
  std::array<float, 4> rewards{};
  static ActionMask sel;

  if (!strcmp(argv[1], "mapgen")) {
    unsigned seed0 = (unsigned)atol(argv[3]);
    unsigned nseeds = (unsigned)atol(argv[4]);
    int n_players = atoi(argv[5]);
    int n_pieces = atoi(argv[6]);
    int diff = atoi(argv[7]);
    for (unsigned s = seed0; s < seed0 + nseeds; s++) {
      cog_env env(s, (u_char)n_players, (u_char)n_pieces, (Difficulty)diff,
                  100000, false);
      env.init(obs, info, rewards, sel);
      unsigned char ok = 1;
      try {
        env.reset();
      } catch (generate_map_failure&) {
        ok = 0;
      }
      fwrite(&s, 4, 1, f);
      fwrite(&ok, 1, 1, f);
      if (!ok) continue;
      const auto& pieces = env.get_map().get_pieces();
      int np = (int)pieces.size();
      fwrite(&np, 4, 1, f);
      for (auto* p : pieces) {
        int id = lib_id(p);
        int nh = (int)p->get_xy().size();
        fwrite(&id, 4, 1, f);
        fwrite(&nh, 4, 1, f);
        for (auto& xy : p->get_xy()) {
          fwrite(&xy.x, 4, 1, f);
          fwrite(&xy.y, 4, 1, f);
        }
      }
      dump_map_obs(f, obs);
    }
  } else if (!strcmp(argv[1], "traj")) {
    unsigned env_seed = (unsigned)atol(argv[3]);
    unsigned sampler_seed = (unsigned)atol(argv[4]);
    int n_players = atoi(argv[5]);
    int n_pieces = atoi(argv[6]);
    int diff = atoi(argv[7]);
    unsigned max_steps = (unsigned)atol(argv[8]);
    int T = atoi(argv[9]);
    int mask_src = argc > 10 ? atoi(argv[10]) : 0;
    cog_env env(env_seed, (u_char)n_players, (u_char)n_pieces,
                (Difficulty)diff, max_steps, false);
    action_sampler sampler(sampler_seed);
    env.init(obs, info, rewards, sel);
    memset(&info, 0, sizeof(info));
    env.reset();
    unsigned hdr[6] = {env_seed, sampler_seed, (unsigned)n_players,
                       (unsigned)n_pieces, (unsigned)diff, (unsigned)T};
    fwrite(hdr, 4, 6, f);
    dump_map_obs(f, obs);
    unsigned char agent0 = env.get_agent_selection();
    fwrite(&agent0, 1, 1, f);
    dump_mask(f, sel);
    for (int p = 0; p < 4; p++) dump_mask(f, obs.player_data[p].action_mask);
    dump_piles(f, obs);
    for (int t = 0; t < T; t++) {
      const ActionMask& src =
          mask_src ? obs.player_data[env.get_agent_selection()].action_mask
                   : sel;
      ActionData act = sampler.sample(src);
      env.step(act);
      unsigned char done = env.get_done();
      if (done) env.reset();  // vec_environment auto-reset semantics
      unsigned char rec[5] = {act.play, act.play_special, act.remove, act.move,
                              act.get_from_shop};
      fwrite(rec, 1, 5, f);
      fwrite(&done, 1, 1, f);
      unsigned char agent = env.get_agent_selection();
      fwrite(&agent, 1, 1, f);
      unsigned char phase = obs.shared.phase;
      fwrite(&phase, 1, 1, f);
      fwrite(rewards.data(), 4, 4, f);
      fwrite(obs.shared.current_resources.data(), 4, 3, f);
      fwrite(obs.shared.shop.data(), 1, 18, f);
      dump_piles(f, obs);
      dump_mask(f, sel);
      for (int p = 0; p < 4; p++) dump_mask(f, obs.player_data[p].action_mask);
      fwrite(&info.total_length, 4, 1, f);
      for (int p = 0; p < 4; p++) {
        const AgentInfo& ai = info.agent_infos[p];
        fwrite(&ai.steps_taken, 1, 1, f);
        fwrite(&ai.returns, 4, 1, f);
        fwrite(&ai.travelled_hexes, 4, 1, f);
        fwrite(&ai.cards_added, 1, 1, f);
        fwrite(&ai.cards_removed, 1, 1, f);
        fwrite(&ai.n_machete_uses, 4, 1, f);
        fwrite(&ai.n_paddle_uses, 4, 1, f);
        fwrite(&ai.n_coin_uses, 4, 1, f);
        fwrite(&ai.n_card_uses, 4, 1, f);
      }
      if (done) dump_map_obs(f, obs);
    }
  }
  fclose(f);
  return 0;
}
