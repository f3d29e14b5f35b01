/* Deterministic libc-rand replacement for oracle parity builds.
 *
 * The reference's VHS paths call rand()/srand() (crt_core.c:343-357,
 * crt_ntscvhs.c:205-207), which is not reproducible across platforms.  The
 * oracle is compiled with -Drand=crt_oracle_rand -Dsrand=crt_oracle_srand so
 * those call sites resolve here instead; the framework implements the exact
 * same generator (ntsc_crt_tpu/ops/lcg.py: RAND_A/RAND_B), making VHS output
 * bit-reproducible on both sides of the parity tests.
 */
static unsigned int crt_oracle_rand_state = 1u;

int crt_oracle_rand(void)
{
    crt_oracle_rand_state = crt_oracle_rand_state * 1103515245u + 12345u;
    /* 31-bit output: the VHS noise path reads bits 16..23 of the return
     * value (crt_core.c:362), so the output must span the full 31-bit
     * range like glibc's rand, not the C-standard sample's 15 bits. */
    return (int)(crt_oracle_rand_state >> 1);
}

void crt_oracle_srand(unsigned int seed)
{
    crt_oracle_rand_state = seed;
}

/* Struct-layout pin: the Python-side ctypes mirrors (oracle.py) hard-code
 * the field order of struct CRT / struct NTSC_SETTINGS; a silent
 * misalignment would corrupt every parity state assertion.  Export the
 * compiled sizes so Oracle.__init__ can assert ctypes.sizeof == C sizeof
 * (VERDICT.md r2, weak #7). */
#include "crt_core.h"

unsigned long crt_oracle_sizeof_crt(void)
{
    return (unsigned long)sizeof(struct CRT);
}

unsigned long crt_oracle_sizeof_settings(void)
{
    return (unsigned long)sizeof(struct NTSC_SETTINGS);
}
