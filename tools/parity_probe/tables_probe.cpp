// Dumps the reference's static game data (card table, piece library,
// connection tables) so eldorado_tpu.core.tables can be verified field by
// field (parity target: /root/reference src/cards.cpp:40-78, src/map.cpp:446-695).
//
// Usage: tables_probe <outfile>  (text format, line oriented)
#include "cards.h"
#include "map.h"
#include <cstdio>

extern std::array<MapPiece, 2> start_pieces;
extern std::array<MapPiece, 16> travel_pieces;
extern std::array<MapPiece, 2> end_pieces;
extern std::array<const Card *, N_BUYABLETYPES> shop_cards;

static void dump_piece(FILE* f, const MapPiece& p, const char* kind, int idx) {
  fprintf(f, "piece %s %d diff=%d type=%d size=%d n=%zu\n", kind, idx,
          (int)p.get_difficulty(), (int)p.get_type(), (int)p.get_size(),
          p.get_hexes().size());
  const auto& hx = p.get_hexes();
  const auto& xy = p.get_xy();
  for (size_t i = 0; i < hx.size(); i++) {
    fprintf(f, "hex %zu req=%d n=%d end=%d start=%d x=%.6f y=%.6f\n", i,
            (int)hx[i]->requirement, (int)hx[i]->n_required,
            (int)hx[i]->is_end, (int)hx[i]->player_start, xy[i].x, xy[i].y);
  }
}

static void dump_conns(FILE* f, MapPiece& a, const MapPiece& b, const char* tag) {
  ConnectionInfo ci = a.get_centered_connections(b);
  fprintf(f, "conn %s n=%zu\n", tag, ci.coords.size());
  for (size_t i = 0; i < ci.coords.size(); i++) {
    fprintf(f, "c %zu x=%.6f y=%.6f rots=", i, ci.coords[i].x, ci.coords[i].y);
    for (int r : ci.rotations[i]) fprintf(f, "%d,", r);
    fprintf(f, "\n");
  }
}

int main(int argc, char** argv) {
  if (argc < 2) return 1;
  FILE* f = fopen(argv[1], "w");
  for (size_t i = 0; i < cards_by_type.size(); i++) {
    const Card& c = cards_by_type[i];
    fprintf(f, "card %zu type=%d cost=%d mkt=%d su=%d res=%d,%d,%d special=%d\n",
            i, (int)c.type, (int)c.cost, (int)c.starts_in_market,
            (int)c.singleUse, (int)c.resources[0], (int)c.resources[1],
            (int)c.resources[2], (int)c.is_special);
  }
  for (size_t i = 0; i < shop_cards.size(); i++)
    fprintf(f, "shopslot %zu type=%d\n", i, (int)shop_cards[i]->type);
  for (size_t i = 0; i < 2; i++) dump_piece(f, start_pieces[i], "start", (int)i);
  for (size_t i = 0; i < 16; i++) dump_piece(f, travel_pieces[i], "travel", (int)i);
  for (size_t i = 0; i < 2; i++) dump_piece(f, end_pieces[i], "end", (int)i);
  // Connection tables for all (placed kind, new kind) combos on pristine pieces.
  dump_conns(f, start_pieces[0], travel_pieces[0], "START.LARGE->TRAVEL.LARGE");
  dump_conns(f, start_pieces[0], travel_pieces[12], "START.LARGE->TRAVEL.SMALL");
  dump_conns(f, start_pieces[0], end_pieces[0], "START.LARGE->END.TRIPLE");
  dump_conns(f, travel_pieces[0], travel_pieces[1], "TRAVEL.LARGE->TRAVEL.LARGE");
  dump_conns(f, travel_pieces[0], travel_pieces[12], "TRAVEL.LARGE->TRAVEL.SMALL");
  dump_conns(f, travel_pieces[0], end_pieces[0], "TRAVEL.LARGE->END.TRIPLE");
  dump_conns(f, travel_pieces[12], travel_pieces[0], "TRAVEL.SMALL->TRAVEL.LARGE");
  dump_conns(f, travel_pieces[12], travel_pieces[13], "TRAVEL.SMALL->TRAVEL.SMALL");
  dump_conns(f, travel_pieces[12], end_pieces[0], "TRAVEL.SMALL->END.TRIPLE");
  dump_conns(f, end_pieces[0], travel_pieces[0], "END.TRIPLE->TRAVEL.LARGE");
  fclose(f);
  return 0;
}
