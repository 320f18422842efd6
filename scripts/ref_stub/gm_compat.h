/* ICC-intrinsic compatibility for g++ golden builds */
#include <mm_malloc.h>
#include <x86intrin.h>
static inline int _popcnt32(int x) { return __builtin_popcount((unsigned)x); }
static inline long long _popcnt64(long long x) { return __builtin_popcountll((unsigned long long)x); }
