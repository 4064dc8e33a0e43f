// dtown native map compiler.
//
// C++ equivalent of the python map pipeline (dtown/map_loader.py +
// dtown/curves.py + dtown/spawn_bank.py): parses the map-yaml subset,
// bakes tile grids + lane bezier control points + object collision
// footprints, and rejection-samples the spawn-pose bank. This replaces
// the native surface the reference reaches through PyYAML/libyaml
// (reference: simulator.py::_load_map, SURVEY.md §2.15) with a real
// native data-loader rather than a python wrapper.
//
// Exported C ABI: dtown_compile_map(path, CMap*) -> 0 on success.
// The python binding (dtown/native) mirrors CMap with ctypes; tests
// cross-check every array against the python compiler bit-for-bit
// (tiles/curves/objects) and property-check the spawn bank.
//
// Build: native/build.sh -> libdtown_mapc.so

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace {

// ---- limits (mirrored in dtown/native/__init__.py) -------------------
constexpr int MAXG = 32;        // max grid edge
constexpr int MAXC = 12;        // max curves per tile
constexpr int MAXO = 64;        // max objects
constexpr int BANK = 2048;      // spawn bank size
constexpr int PROPOSALS = 40000;
constexpr int MAXW = (MAXG * MAXG + 3) / 4;  // packed tile words

// ---- constants (dtown/constants.py §2.2a) ----------------------------
constexpr double LANE = 0.20;
constexpr double ROBOT_WIDTH = 0.15;
constexpr double ROBOT_LENGTH = 0.18;
constexpr double CAMERA_FORWARD_DIST = 0.066;
constexpr double MIN_SPAWN_OBJ_DIST = 0.25;
constexpr double SAFETY_RAD_MULT = 1.8;
constexpr int BEZIER_ITERS = 8;

// tile kinds (dtown/types.py)
enum {
  T_EMPTY = 0, T_STRAIGHT, T_CURVE_LEFT, T_CURVE_RIGHT,
  T_3WAY_LEFT, T_3WAY_RIGHT, T_4WAY, T_ASPHALT, T_GRASS, T_FLOOR,
};

const char* OBJ_KINDS[] = {
  "duckie", "duckiebot", "cone", "barrier", "tree", "house", "truck",
  "bus", "building", "sign_stop", "sign_T_intersect", "sign_yield",
  "sign_left_T_intersect", "sign_right_T_intersect",
  "sign_4_way_intersect", "sign_do_not_enter", "sign_oneway_left",
  "sign_oneway_right", "sign_duck_crossing", "sign_pedestrian",
  "trafficlight",
};
constexpr int N_OBJ_KINDS = 21;

// (width, height, length) at scale 1 — keep in sync with
// dtown/assets.py::OBJECT_DIMS (cross-checked by tests/test_native.py)
const double OBJ_DIMS[N_OBJ_KINDS][3] = {
  {0.090, 0.090, 0.120}, {0.130, 0.120, 0.180}, {0.080, 0.080, 0.080},
  {0.500, 0.080, 0.080}, {0.250, 0.250, 0.250}, {0.500, 0.500, 0.500},
  {0.200, 0.200, 0.400}, {0.200, 0.180, 0.450}, {0.600, 0.600, 0.600},
  {0.180, 0.180, 0.030}, {0.180, 0.180, 0.030}, {0.180, 0.180, 0.030},
  {0.180, 0.180, 0.030}, {0.180, 0.180, 0.030}, {0.180, 0.180, 0.030},
  {0.180, 0.180, 0.030}, {0.180, 0.180, 0.030}, {0.180, 0.180, 0.030},
  {0.180, 0.180, 0.030}, {0.180, 0.180, 0.030}, {0.150, 0.250, 0.150},
};

// ---- primitive render models (dtown/render/meshes.py::_PRIMS) --------
// Each object kind is a soup of <= P_MAX analytic primitives in model
// space (facing +x, ground y=0, meters at scale 1). The python table is
// the render-side source of truth; this native copy is what the scene
// baker below consumes, and tests/test_native.py cross-checks the two
// float-for-float.
constexpr int P_MAX = 4;
constexpr int PRIM_SPHERE = 0;
constexpr int PRIM_BOX = 1;

struct PrimDef {
  int type;        // PRIM_SPHERE | PRIM_BOX
  double c[3];     // model-space center
  double p[3];     // radius (spheres, p[0]) or half-extents (boxes)
  double col[3];   // base color
  int phase;       // traffic-light lamp (phase-colored)
};

struct KindPrims { int n; PrimDef prims[P_MAX]; };

// sign geometry shared by all sign_* kinds: pole, face, glyph strip
KindPrims sign_prims(const double face[3], const double glyph[3]) {
  KindPrims k;
  k.n = 3;
  k.prims[0] = {PRIM_BOX, {0.0, 0.065, 0.0}, {0.006, 0.065, 0.006},
                {0.45, 0.45, 0.45}, 0};
  k.prims[1] = {PRIM_BOX, {0.0, 0.145, 0.0}, {0.010, 0.035, 0.045},
                {face[0], face[1], face[2]}, 0};
  k.prims[2] = {PRIM_BOX, {0.011, 0.145, 0.0}, {0.0015, 0.012, 0.022},
                {glyph[0], glyph[1], glyph[2]}, 0};
  return k;
}

const KindPrims& kind_prims(int kid) {
  static KindPrims table[N_OBJ_KINDS];
  static bool init = false;
  if (!init) {
    init = true;
    for (int k = 0; k < N_OBJ_KINDS; ++k) table[k].n = 0;
    auto set = [&](int k, std::initializer_list<PrimDef> ps) {
      int i = 0;
      for (const auto& p : ps) table[k].prims[i++] = p;
      table[k].n = i;
    };
    set(0, {  // duckie
      {PRIM_SPHERE, {0.0, 0.035, 0.0}, {0.040, 0, 0}, {0.95, 0.78, 0.09}, 0},
      {PRIM_SPHERE, {0.035, 0.075, 0.0}, {0.026, 0, 0}, {0.96, 0.80, 0.10}, 0},
      {PRIM_BOX, {0.068, 0.072, 0.0}, {0.016, 0.008, 0.010},
       {0.90, 0.45, 0.08}, 0},
      {PRIM_SPHERE, {-0.038, 0.052, 0.0}, {0.018, 0, 0},
       {0.97, 0.83, 0.12}, 0},
    });
    set(1, {  // duckiebot
      {PRIM_BOX, {0.0, 0.045, 0.0}, {0.090, 0.045, 0.065},
       {0.16, 0.16, 0.20}, 0},
      {PRIM_BOX, {0.02, 0.10, 0.0}, {0.045, 0.012, 0.045},
       {0.25, 0.35, 0.60}, 0},
      {PRIM_BOX, {-0.02, 0.028, 0.0}, {0.034, 0.028, 0.072},
       {0.05, 0.05, 0.06}, 0},
      {PRIM_BOX, {0.085, 0.115, 0.0}, {0.008, 0.022, 0.010},
       {0.10, 0.10, 0.12}, 0},
    });
    set(2, {  // cone
      {PRIM_BOX, {0.0, 0.012, 0.0}, {0.032, 0.012, 0.032},
       {0.90, 0.35, 0.10}, 0},
      {PRIM_BOX, {0.0, 0.048, 0.0}, {0.016, 0.030, 0.016},
       {0.95, 0.38, 0.10}, 0},
    });
    set(3, {  // barrier
      {PRIM_BOX, {0.0, 0.045, 0.0}, {0.040, 0.035, 0.250},
       {0.85, 0.82, 0.80}, 0},
      {PRIM_BOX, {0.0, 0.012, 0.0}, {0.044, 0.012, 0.260},
       {0.70, 0.20, 0.15}, 0},
    });
    set(4, {  // tree
      {PRIM_BOX, {0.0, 0.06, 0.0}, {0.020, 0.060, 0.020},
       {0.38, 0.26, 0.13}, 0},
      {PRIM_SPHERE, {0.0, 0.170, 0.0}, {0.095, 0, 0},
       {0.13, 0.42, 0.12}, 0},
    });
    set(5, {  // house
      {PRIM_BOX, {0.0, 0.20, 0.0}, {0.240, 0.200, 0.240},
       {0.73, 0.53, 0.35}, 0},
      {PRIM_BOX, {0.0, 0.44, 0.0}, {0.255, 0.045, 0.255},
       {0.55, 0.18, 0.12}, 0},
    });
    set(6, {  // truck
      {PRIM_BOX, {0.13, 0.085, 0.0}, {0.065, 0.085, 0.095},
       {0.30, 0.32, 0.40}, 0},
      {PRIM_BOX, {-0.08, 0.10, 0.0}, {0.120, 0.100, 0.100},
       {0.78, 0.79, 0.82}, 0},
    });
    set(7, {  // bus
      {PRIM_BOX, {0.0, 0.085, 0.0}, {0.220, 0.085, 0.095},
       {0.85, 0.70, 0.15}, 0},
      {PRIM_BOX, {0.0, 0.155, 0.0}, {0.200, 0.022, 0.090},
       {0.70, 0.58, 0.12}, 0},
    });
    set(8, {  // building
      {PRIM_BOX, {0.0, 0.30, 0.0}, {0.290, 0.300, 0.290},
       {0.62, 0.60, 0.58}, 0},
    });
    // signs (ids 9..19, order = OBJ_KINDS): face + glyph colors from
    // meshes.py::_SIGN_FACE_COLORS / _SIGN_GLYPH_COLORS
    const double faces[11][3] = {
      {0.80, 0.12, 0.10}, {0.90, 0.90, 0.90}, {0.85, 0.80, 0.20},
      {0.90, 0.90, 0.90}, {0.90, 0.90, 0.90}, {0.90, 0.90, 0.90},
      {0.85, 0.15, 0.15}, {0.20, 0.30, 0.80}, {0.20, 0.30, 0.80},
      {0.90, 0.80, 0.20}, {0.90, 0.90, 0.30},
    };
    const double glyphs[11][3] = {
      {0.95, 0.95, 0.95}, {0.10, 0.10, 0.10}, {0.80, 0.15, 0.12},
      {0.10, 0.10, 0.10}, {0.10, 0.10, 0.10}, {0.15, 0.15, 0.60},
      {0.95, 0.95, 0.95}, {0.90, 0.90, 0.90}, {0.90, 0.90, 0.90},
      {0.15, 0.12, 0.10}, {0.15, 0.15, 0.18},
    };
    for (int s = 0; s < 11; ++s) table[9 + s] = sign_prims(faces[s], glyphs[s]);
    set(20, {  // trafficlight
      {PRIM_BOX, {0.0, 0.105, 0.0}, {0.014, 0.105, 0.014},
       {0.22, 0.22, 0.22}, 0},
      {PRIM_BOX, {0.0, 0.225, 0.0}, {0.045, 0.028, 0.045},
       {0.10, 0.10, 0.10}, 0},
      {PRIM_BOX, {0.046, 0.225, 0.0}, {0.006, 0.018, 0.018},
       {0.9, 0.1, 0.1}, 1},
    });
  }
  return table[kid];
}

// conservative model-space bound radius of a kind's prim soup
// (dtown/render/blob_raster.py::_bound_radius, before the scale factor).
// The python side reads prim values out of float32 tables
// (meshes.py::prim_tables), so round through float here to match.
double prim_bound_radius(int kid) {
  const KindPrims& kp = kind_prims(kid);
  auto f32 = [](double v) { return (double)(float)v; };
  double r = 0.0;
  for (int i = 0; i < kp.n; ++i) {
    const PrimDef& pr = kp.prims[i];
    double p0 = f32(pr.p[0]), p1 = f32(pr.p[1]), p2 = f32(pr.p[2]);
    double pr_r = pr.type == PRIM_BOX
        ? std::sqrt(p0 * p0 + p1 * p1 + p2 * p2)
        : p0;
    double c0 = f32(pr.c[0]), c1 = f32(pr.c[1]), c2 = f32(pr.c[2]);
    double cn = std::sqrt(c0 * c0 + c1 * c1 + c2 * c2);
    r = std::max(r, cn + pr_r);
  }
  return r;
}

// nominal light direction, normalized in f64 from the f32 constants
// (dtown/randomization.py::NOMINAL_LIGHT_DIR) — the (double)(float)
// casts reproduce python's np.float32 -> float64 promotion exactly
struct LightDir { double x, y, z; };
LightDir nominal_light() {
  double lx = (double)(float)-0.35, ly = (double)(float)-0.82,
         lz = (double)(float)-0.45;
  double n = std::sqrt(lx * lx + ly * ly + lz * lz);
  return {lx / n, ly / n, lz / n};
}

struct Vec2 { double x, z; };

struct CMap {
  int32_t H, W, n_objects, max_objects;
  double tile_size;
  int32_t tile_kind[MAXG * MAXG];
  int32_t tile_angle[MAXG * MAXG];
  uint8_t drivable[MAXG * MAXG];
  double curves[MAXG * MAXG * MAXC * 4 * 3];
  uint8_t curve_mask[MAXG * MAXG * MAXC];
  double obj_pos[MAXO * 3];
  double obj_y_rot[MAXO];
  double obj_scale[MAXO];
  double obj_height[MAXO];
  double obj_halfdims[MAXO * 2];
  double obj_corners[MAXO * 4 * 2];
  double obj_norms[MAXO * 2 * 2];
  double obj_safety_rad[MAXO];
  int32_t obj_kind[MAXO];
  uint8_t obj_mask[MAXO];
  uint8_t obj_optional[MAXO];
  uint8_t obj_dynamic[MAXO];
  double obj_walk_dist[MAXO];
  double spawn_pos[BANK * 3];
  double spawn_angle[BANK];
  double spawn_lane_deg[BANK];
  uint8_t spawn_mask[BANK];
  // packed tile words for the render kernel's select chain: 4 tiles per
  // int32, byte = kind | angle<<4, little-endian, flattened over the
  // map's actual H*W grid (dtown/render/blob_raster.py::pack_tile_words)
  int32_t n_words;
  int32_t tile_words[MAXW];
  // render-scene bake (dtown/render/blob_raster.py::build_render_plan):
  // per-object model rotation sin/cos of -y_rot, the nominal light
  // direction rotated into model space, and the conservative prim-soup
  // bound radius (world units, scale applied)
  double obj_sincos[MAXO * 2];
  double obj_lmodel[MAXO * 3];
  double obj_bound_rad[MAXO];
};

// ---------------------------------------------------------------------
// Minimal YAML-subset parser for the map schema (SURVEY.md §2.10):
//   tiles:\n- [tok, tok, ...] rows
//   objects:\n- kind: x\n  pos: [a, b]\n  ... (2-space indented fields)
//   tile_size: f
// ---------------------------------------------------------------------
struct ObjSpec {
  std::map<std::string, std::string> fields;
};

struct MapSpec {
  std::vector<std::vector<std::string>> tiles;
  std::vector<ObjSpec> objects;
  double tile_size = 0.585;
};

std::string strip(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r\n");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t\r\n");
  return s.substr(a, b - a + 1);
}

std::vector<std::string> parse_flow_list(const std::string& s) {
  // "[a, b, c]" -> tokens
  std::vector<std::string> out;
  size_t l = s.find('['), r = s.rfind(']');
  if (l == std::string::npos || r == std::string::npos || r < l) return out;
  std::string body = s.substr(l + 1, r - l - 1);
  std::stringstream ss(body);
  std::string item;
  while (std::getline(ss, item, ',')) out.push_back(strip(item));
  return out;
}

bool parse_yaml(const std::string& path, MapSpec* spec, std::string* err) {
  std::ifstream f(path);
  if (!f) { *err = "cannot open " + path; return false; }
  std::string line;
  enum { NONE, TILES, OBJECTS } section = NONE;
  ObjSpec* cur = nullptr;
  while (std::getline(f, line)) {
    std::string t = strip(line);
    if (t.empty() || t[0] == '#') continue;
    if (line[0] != ' ' && line[0] != '-') {
      cur = nullptr;
      if (t.rfind("tiles:", 0) == 0) { section = TILES; continue; }
      if (t.rfind("objects:", 0) == 0) { section = OBJECTS; continue; }
      size_t c = t.find(':');
      if (c != std::string::npos) {
        std::string key = strip(t.substr(0, c));
        std::string val = strip(t.substr(c + 1));
        if (key == "tile_size") spec->tile_size = atof(val.c_str());
        section = NONE;
      }
      continue;
    }
    if (section == TILES && t[0] == '-') {
      spec->tiles.push_back(parse_flow_list(t));
    } else if (section == OBJECTS) {
      std::string body = t;
      if (t[0] == '-') {
        spec->objects.emplace_back();
        cur = &spec->objects.back();
        body = strip(t.substr(1));
      }
      if (cur && !body.empty()) {
        size_t c = body.find(':');
        if (c != std::string::npos) {
          cur->fields[strip(body.substr(0, c))] = strip(body.substr(c + 1));
        }
      }
    }
  }
  return true;
}

// ---------------------------------------------------------------------
// Curve generator — same port/maneuver model as dtown/curves.py
// ---------------------------------------------------------------------
Vec2 rightOf(Vec2 d) { return {-d.z, d.x}; }
Vec2 leftOf(Vec2 d) { return {d.z, -d.x}; }
Vec2 add(Vec2 a, Vec2 b) { return {a.x + b.x, a.z + b.z}; }
Vec2 mul(Vec2 a, double s) { return {a.x * s, a.z * s}; }

void straight_cps(Vec2 d, Vec2 out[4]) {
  Vec2 r = rightOf(d);
  Vec2 p0 = add(mul(d, -0.5), mul(r, LANE));
  Vec2 p3 = add(mul(d, 0.5), mul(r, LANE));
  out[0] = p0; out[1] = add(p0, mul(d, 0.25));
  out[2] = add(p3, mul(d, -0.25)); out[3] = p3;
}

void left_cps(Vec2 d, Vec2 out[4]) {
  Vec2 l = leftOf(d);
  Vec2 p0 = add(mul(d, -0.5), mul(rightOf(d), LANE));
  Vec2 p3 = add(mul(l, 0.5), mul(d, LANE));
  out[0] = p0; out[1] = add(p0, mul(d, 0.5));
  out[2] = add(p3, mul(l, -0.5)); out[3] = p3;
}

void right_cps(Vec2 d, Vec2 out[4]) {
  Vec2 r = rightOf(d);
  Vec2 p0 = add(mul(d, -0.5), mul(r, LANE));
  Vec2 p3 = add(mul(r, 0.5), mul(d, -LANE));
  out[0] = p0; out[1] = add(p0, mul(d, 0.3));
  out[2] = add(p3, mul(r, -0.2)); out[3] = p3;
}

const Vec2 ZP{0, 1}, ZM{0, -1}, XP{1, 0}, XM{-1, 0};

int tile_curves(int kind, Vec2 out[MAXC][4]) {
  int n = 0;
  auto emit = [&](void (*f)(Vec2, Vec2[4]), Vec2 d) {
    f(d, out[n]); ++n;
  };
  switch (kind) {
    case T_STRAIGHT:
      emit(straight_cps, ZP); emit(straight_cps, ZM); break;
    case T_CURVE_LEFT:
      emit(left_cps, ZP); emit(right_cps, XM); break;
    case T_CURVE_RIGHT:
      emit(right_cps, ZP); emit(left_cps, XP); break;
    case T_3WAY_LEFT:
      emit(straight_cps, ZP); emit(left_cps, ZP);
      emit(straight_cps, ZM); emit(right_cps, ZM);
      emit(left_cps, XM); emit(right_cps, XM); break;
    case T_3WAY_RIGHT:
      emit(straight_cps, ZP); emit(right_cps, ZP);
      emit(straight_cps, ZM); emit(left_cps, ZM);
      emit(left_cps, XP); emit(right_cps, XP); break;
    case T_4WAY:
      for (Vec2 d : {ZP, ZM, XP, XM}) {
        emit(straight_cps, d); emit(left_cps, d); emit(right_cps, d);
      }
      break;
    default: break;
  }
  return n;
}

void rotate90(Vec2* p, int a) {
  // (x, z) -> (x c + z s, z c - x s), theta = a * 90 deg
  static const double ct[4] = {1, 0, -1, 0};
  static const double st[4] = {0, 1, 0, -1};
  double c = ct[a & 3], s = st[a & 3];
  double x = p->x, z = p->z;
  p->x = x * c + z * s;
  p->z = z * c - x * s;
}

int tile_kind_of(const std::string& name) {
  static const std::map<std::string, int> m = {
    {"empty", T_EMPTY}, {"straight", T_STRAIGHT},
    {"curve_left", T_CURVE_LEFT}, {"curve_right", T_CURVE_RIGHT},
    {"3way_left", T_3WAY_LEFT}, {"3way_right", T_3WAY_RIGHT},
    {"4way", T_4WAY}, {"asphalt", T_ASPHALT}, {"grass", T_GRASS},
    {"floor", T_FLOOR},
  };
  auto it = m.find(name);
  return it == m.end() ? -1 : it->second;
}

bool drivable_kind(int k) {
  return k >= T_STRAIGHT && k <= T_4WAY;
}

// ---------------------------------------------------------------------
// Spawn bank (same acceptance test as dtown/spawn_bank.py)
// ---------------------------------------------------------------------
struct SplitMix64 {
  uint64_t s;
  uint64_t next() {
    uint64_t z = (s += 0x9E3779B97F4A7C15ull);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
  }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
};

struct V3 { double x, y, z; };
V3 v3(double x, double y, double z) { return {x, y, z}; }
V3 addv(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
V3 subv(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
V3 mulv(V3 a, double s) { return {a.x * s, a.y * s, a.z * s}; }
double dotv(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
double normv(V3 a) { return std::sqrt(dotv(a, a)); }

V3 bezier_point(const double* cps, double t) {
  double u = 1.0 - t;
  V3 p{0, 0, 0};
  double w[4] = {u * u * u, 3 * t * u * u, 3 * t * t * u, t * t * t};
  for (int k = 0; k < 4; ++k) {
    p.x += w[k] * cps[k * 3 + 0];
    p.y += w[k] * cps[k * 3 + 1];
    p.z += w[k] * cps[k * 3 + 2];
  }
  return p;
}

V3 bezier_tangent(const double* cps, double t) {
  double u = 1.0 - t;
  double w[3] = {3 * u * u, 6 * u * t, 3 * t * t};
  V3 d{0, 0, 0};
  for (int k = 0; k < 3; ++k) {
    d.x += w[k] * (cps[(k + 1) * 3 + 0] - cps[k * 3 + 0]);
    d.y += w[k] * (cps[(k + 1) * 3 + 1] - cps[k * 3 + 1]);
    d.z += w[k] * (cps[(k + 1) * 3 + 2] - cps[k * 3 + 2]);
  }
  double n = std::max(normv(d), 1e-12);
  return mulv(d, 1.0 / n);
}

double bezier_closest(const double* cps, V3 p) {
  double t_bot = 0.0, t_top = 1.0;
  for (int i = 0; i < BEZIER_ITERS; ++i) {
    double mid = 0.5 * (t_bot + t_top);
    V3 pb = bezier_point(cps, t_bot);
    V3 pt = bezier_point(cps, t_top);
    double db = dotv(subv(pb, p), subv(pb, p));
    double dt_ = dotv(subv(pt, p), subv(pt, p));
    if (db < dt_) t_top = mid; else t_bot = mid;
  }
  return 0.5 * (t_bot + t_top);
}

}  // namespace

extern "C" int dtown_compile_map(const char* path, CMap* out) {
  std::memset(out, 0, sizeof(CMap));
  MapSpec spec;
  std::string err;
  if (!parse_yaml(path, &spec, &err)) {
    std::fprintf(stderr, "mapc: %s\n", err.c_str());
    return 1;
  }
  int H = (int)spec.tiles.size();
  if (H == 0 || H > MAXG) return 2;
  int W = (int)spec.tiles[0].size();
  if (W == 0 || W > MAXG) return 2;
  out->H = H; out->W = W;
  out->tile_size = spec.tile_size;
  double ts = spec.tile_size;

  // ---- tiles + curves ----
  for (int j = 0; j < H; ++j) {
    if ((int)spec.tiles[j].size() != W) return 3;
    for (int i = 0; i < W; ++i) {
      std::string tok = spec.tiles[j][i];
      int angle = 0;
      size_t slash = tok.find('/');
      if (slash != std::string::npos) {
        std::string o = tok.substr(slash + 1);
        tok = tok.substr(0, slash);
        const std::string letters = "SENW";
        size_t li = letters.find(o.empty() ? 'S' : o[0]);
        angle = li == std::string::npos ? 0 : (int)li;
      }
      int kind = tile_kind_of(tok);
      if (kind < 0) return 4;
      int g = j * MAXG + i;
      out->tile_kind[g] = kind;
      out->tile_angle[g] = angle;
      if (drivable_kind(kind)) {
        out->drivable[g] = 1;
        Vec2 local[MAXC][4];
        int n = tile_curves(kind, local);
        for (int c = 0; c < n; ++c) {
          out->curve_mask[(g)*MAXC + c] = 1;
          for (int k = 0; k < 4; ++k) {
            Vec2 p = local[c][k];
            rotate90(&p, angle);
            double* dst =
                &out->curves[((g)*MAXC + c) * 12 + k * 3];
            dst[0] = p.x * ts + (i + 0.5) * ts;
            dst[1] = 0.0;
            dst[2] = p.z * ts + (j + 0.5) * ts;
          }
        }
      }
    }
  }

  // ---- packed tile words (render-kernel scene baking) ----
  {
    int n_tiles = H * W;
    out->n_words = (n_tiles + 3) / 4;
    for (int t = 0; t < n_tiles; ++t) {
      int j = t / W, i = t % W;
      int g = j * MAXG + i;
      uint32_t byte = (uint32_t)((out->tile_kind[g] & 0xF) |
                                 ((out->tile_angle[g] & 0x3) << 4));
      out->tile_words[t >> 2] |= (int32_t)(byte << ((t & 3) * 8));
    }
  }

  // ---- objects ----
  int n_obj = (int)spec.objects.size();
  if (n_obj > MAXO) return 5;
  out->n_objects = n_obj;
  int q = 8;
  out->max_objects = std::max(q, ((n_obj + q - 1) / q) * q);
  for (int m = 0; m < n_obj; ++m) {
    auto& f = spec.objects[m].fields;
    std::string kind = f.count("kind") ? f["kind"] : "duckie";
    int kid = -1;
    for (int k = 0; k < N_OBJ_KINDS; ++k)
      if (kind == OBJ_KINDS[k]) { kid = k; break; }
    if (kid < 0) return 6;
    auto pos_list = parse_flow_list(f["pos"]);
    double x = atof(pos_list[0].c_str()) * ts;
    double z = atof(pos_list[1].c_str()) * ts;
    double y = pos_list.size() > 2 ? atof(pos_list[2].c_str()) : 0.0;
    double rot = f.count("rotate") ? atof(f["rotate"].c_str()) : 0.0;
    double y_rot = rot * M_PI / 180.0;
    double scale = 1.0;
    if (f.count("height"))
      scale = atof(f["height"].c_str()) / OBJ_DIMS[kid][1];
    else if (f.count("scale"))
      scale = atof(f["scale"].c_str());
    double w = OBJ_DIMS[kid][0] * scale;
    double h = OBJ_DIMS[kid][1] * scale;
    double l = OBJ_DIMS[kid][2] * scale;
    bool stat;
    if (f.count("static"))
      stat = f["static"] == "true" || f["static"] == "True";
    else
      stat = !(kind == "duckie" || kind == "duckiebot");
    bool dyn = (!stat && (kind == "duckie" || kind == "duckiebot"))
               || kind == "trafficlight";

    out->obj_pos[m * 3 + 0] = x;
    out->obj_pos[m * 3 + 1] = y;
    out->obj_pos[m * 3 + 2] = z;
    out->obj_y_rot[m] = y_rot;
    out->obj_scale[m] = scale;
    out->obj_height[m] = h;
    out->obj_halfdims[m * 2 + 0] = 0.5 * w;
    out->obj_halfdims[m * 2 + 1] = 0.5 * l;
    out->obj_kind[m] = kid;
    out->obj_mask[m] = 1;
    out->obj_optional[m] =
        f.count("optional") &&
        (f["optional"] == "true" || f["optional"] == "True");
    out->obj_dynamic[m] = dyn;
    // duckie pedestrian walk distance before reversing (map yaml
    // `walk_distance:` override; dtown/objects.py DUCKIE_WALK_DISTANCE)
    out->obj_walk_dist[m] =
        f.count("walk_distance") ? atof(f["walk_distance"].c_str())
                                  : 0.25;
    out->obj_safety_rad[m] =
        SAFETY_RAD_MULT * 0.5 * std::hypot(OBJ_DIMS[kid][0],
                                           OBJ_DIMS[kid][2]) * scale;
    // footprint corners: length along facing (model x), width along right
    double hw = 0.5 * w, hl = 0.5 * l;
    double local[4][2] = {{-hl, -hw}, {hl, -hw}, {hl, hw}, {-hl, hw}};
    double c = std::cos(y_rot), s = std::sin(y_rot);
    for (int k = 0; k < 4; ++k) {
      double lx = local[k][0], lz = local[k][1];
      out->obj_corners[(m * 4 + k) * 2 + 0] = lx * c + lz * s + x;
      out->obj_corners[(m * 4 + k) * 2 + 1] = lz * c - lx * s + z;
    }
    for (int e = 0; e < 2; ++e) {
      double ex = out->obj_corners[(m * 4 + e + 1) * 2 + 0] -
                  out->obj_corners[(m * 4 + e) * 2 + 0];
      double ez = out->obj_corners[(m * 4 + e + 1) * 2 + 1] -
                  out->obj_corners[(m * 4 + e) * 2 + 1];
      double n = std::max(std::hypot(ex, ez), 1e-12);
      out->obj_norms[(m * 2 + e) * 2 + 0] = -ez / n;
      out->obj_norms[(m * 2 + e) * 2 + 1] = ex / n;
    }
    // render-scene bake: model rotation, model-space light, bound
    // radius. The python plan (blob_raster.build_render_plan) reads
    // y_rot/scale back out of the float32 MapArrays, so round through
    // float here to bake the same doubles.
    double yr32 = (double)(float)y_rot, sc32 = (double)(float)scale;
    double s_r = std::sin(-yr32), c_r = std::cos(-yr32);
    LightDir L = nominal_light();
    out->obj_sincos[m * 2 + 0] = s_r;
    out->obj_sincos[m * 2 + 1] = c_r;
    out->obj_lmodel[m * 3 + 0] = L.x * c_r + L.z * s_r;
    out->obj_lmodel[m * 3 + 1] = L.y;
    out->obj_lmodel[m * 3 + 2] = L.z * c_r - L.x * s_r;
    out->obj_bound_rad[m] = prim_bound_radius(kid) * sc32;
  }

  // ---- spawn bank ----
  std::vector<int> driv_cells;
  for (int j = 0; j < H; ++j)
    for (int i = 0; i < W; ++i)
      if (out->drivable[j * MAXG + i]) driv_cells.push_back(j * MAXG + i);
  if (driv_cells.empty()) return 0;

  auto drivable_at = [&](double px, double pz) {
    int ii = (int)std::floor(px / ts);
    int jj = (int)std::floor(pz / ts);
    if (ii < 0 || ii >= W || jj < 0 || jj >= H) return false;
    return out->drivable[jj * MAXG + ii] != 0;
  };

  SplitMix64 rng{12345};
  struct Entry { double pos[3]; double angle; double deg; };
  std::vector<Entry> bank;
  bank.reserve(BANK);
  const double sf = 1.3;
  for (int it = 0; it < PROPOSALS && (int)bank.size() < BANK; ++it) {
    int cell = driv_cells[rng.next() % driv_cells.size()];
    int cj = cell / MAXG, ci = cell % MAXG;
    double px = (ci + rng.uniform()) * ts;
    double pz = (cj + rng.uniform()) * ts;
    double ang = rng.uniform() * 2.0 * M_PI;
    V3 dir = v3(std::cos(ang), 0, -std::sin(ang));
    V3 right = v3(std::sin(ang), 0, std::cos(ang));
    V3 pos = v3(px, 0, pz);
    V3 center = addv(pos, mulv(dir, CAMERA_FORWARD_DIST - 0.5 * ROBOT_LENGTH));
    // drivability of center, wheels, front
    bool ok = drivable_at(center.x, center.z);
    V3 lw = subv(center, mulv(right, sf * 0.5 * ROBOT_WIDTH));
    V3 rw = addv(center, mulv(right, sf * 0.5 * ROBOT_WIDTH));
    V3 fr = addv(center, mulv(dir, sf * 0.5 * ROBOT_LENGTH));
    ok = ok && drivable_at(lw.x, lw.z) && drivable_at(rw.x, rw.z) &&
         drivable_at(fr.x, fr.z);
    if (!ok) continue;
    // object clearance + SAT
    bool blocked = false;
    for (int m = 0; m < n_obj && !blocked; ++m) {
      double dx = out->obj_pos[m * 3 + 0] - center.x;
      double dz = out->obj_pos[m * 3 + 2] - center.z;
      double d = std::hypot(dx, dz);
      if (d < MIN_SPAWN_OBJ_DIST + out->obj_safety_rad[m]) blocked = true;
      // SAT agent-vs-object
      if (!blocked) {
        double hw = 0.5 * ROBOT_WIDTH, hl = 0.5 * ROBOT_LENGTH;
        double ac[4][2];
        double f2x = dir.x, f2z = dir.z, r2x = right.x, r2z = right.z;
        double sgn[4][2] = {{-1, 1}, {1, 1}, {1, -1}, {-1, -1}};
        for (int k = 0; k < 4; ++k) {
          ac[k][0] = center.x + sgn[k][0] * hl * f2x + sgn[k][1] * hw * r2x;
          ac[k][1] = center.z + sgn[k][0] * hl * f2z + sgn[k][1] * hw * r2z;
        }
        // axes: agent's 2 + object's 2
        double axes[4][2] = {
          {f2x, f2z}, {r2x, r2z},
          {out->obj_norms[(m * 2 + 0) * 2], out->obj_norms[(m * 2 + 0) * 2 + 1]},
          {out->obj_norms[(m * 2 + 1) * 2], out->obj_norms[(m * 2 + 1) * 2 + 1]},
        };
        bool separated = false;
        for (int a = 0; a < 4 && !separated; ++a) {
          double amin = 1e30, amax = -1e30, bmin = 1e30, bmax = -1e30;
          for (int k = 0; k < 4; ++k) {
            double pa = ac[k][0] * axes[a][0] + ac[k][1] * axes[a][1];
            double pb =
                out->obj_corners[(m * 4 + k) * 2] * axes[a][0] +
                out->obj_corners[(m * 4 + k) * 2 + 1] * axes[a][1];
            amin = std::min(amin, pa); amax = std::max(amax, pa);
            bmin = std::min(bmin, pb); bmax = std::max(bmax, pb);
          }
          if (amax < bmin || bmax < amin) separated = true;
        }
        if (!separated) blocked = true;
      }
    }
    if (blocked) continue;
    // lane angle on the tile under pos
    int ii = (int)std::floor(px / ts), jj = (int)std::floor(pz / ts);
    int g = jj * MAXG + ii;
    double best_dot = -1e30;
    const double* best_cps = nullptr;
    for (int c = 0; c < MAXC; ++c) {
      if (!out->curve_mask[g * MAXC + c]) continue;
      const double* cps = &out->curves[(g * MAXC + c) * 12];
      double chx = cps[9] - cps[0], chz = cps[11] - cps[2];
      double n = std::max(std::hypot(chx, chz), 1e-12);
      double dot = (chx * dir.x + chz * dir.z) / n;
      if (dot > best_dot) { best_dot = dot; best_cps = cps; }
    }
    if (!best_cps) continue;
    double t = bezier_closest(best_cps, pos);
    V3 tan = bezier_tangent(best_cps, t);
    double dd = std::max(-1.0, std::min(1.0, dotv(dir, tan)));
    V3 right_of = v3(-tan.z, 0, tan.x);  // cross(tangent, up)
    double a_rad = std::acos(dd);
    if (dotv(dir, right_of) < 0) a_rad = -a_rad;
    Entry e;
    e.pos[0] = px; e.pos[1] = 0; e.pos[2] = pz;
    e.angle = ang;
    e.deg = a_rad * 180.0 / M_PI;
    bank.push_back(e);
  }
  // sort by |lane angle| (stable) and fill
  std::stable_sort(bank.begin(), bank.end(),
                   [](const Entry& a, const Entry& b) {
                     return std::fabs(a.deg) < std::fabs(b.deg);
                   });
  int nb = (int)bank.size();
  for (int k = 0; k < BANK; ++k) {
    const Entry& e = bank[nb ? k % nb : 0];
    out->spawn_pos[k * 3 + 0] = e.pos[0];
    out->spawn_pos[k * 3 + 1] = e.pos[1];
    out->spawn_pos[k * 3 + 2] = e.pos[2];
    out->spawn_angle[k] = e.angle;
    out->spawn_lane_deg[k] = e.deg;
    out->spawn_mask[k] = nb > 0;
  }
  return 0;
}

// flat export of the primitive render-model tables, indexed by object
// kind id (dtown/render/meshes.py::prim_tables layout)
struct CPrims {
  int32_t type[N_OBJ_KINDS * P_MAX];
  double center[N_OBJ_KINDS * P_MAX * 3];
  double param[N_OBJ_KINDS * P_MAX * 3];
  double color[N_OBJ_KINDS * P_MAX * 3];
  uint8_t mask[N_OBJ_KINDS * P_MAX];
  uint8_t phase[N_OBJ_KINDS * P_MAX];
};

extern "C" int dtown_prim_tables(CPrims* out) {
  std::memset(out, 0, sizeof(CPrims));
  for (int k = 0; k < N_OBJ_KINDS; ++k) {
    const KindPrims& kp = kind_prims(k);
    for (int i = 0; i < kp.n; ++i) {
      const PrimDef& pr = kp.prims[i];
      int s = k * P_MAX + i;
      out->type[s] = pr.type;
      for (int d = 0; d < 3; ++d) {
        out->center[s * 3 + d] = pr.c[d];
        out->param[s * 3 + d] = pr.p[d];
        out->color[s * 3 + d] = pr.col[d];
      }
      out->mask[s] = 1;
      out->phase[s] = pr.phase ? 1 : 0;
    }
  }
  return 0;
}

extern "C" int dtown_prims_sizeof() { return (int)sizeof(CPrims); }
extern "C" int dtown_mapc_sizeof() { return (int)sizeof(CMap); }
extern "C" int dtown_mapc_abi_version() { return 3; }
