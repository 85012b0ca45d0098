/* LD_PRELOAD shim: report FAKE_NPROC (default 8) schedulable CPUs.
 *
 * Used only by the multi-chip CPU dry run (dissc_tpu/parallel/dryrun.py)
 * on hosts with fewer cores than virtual devices.  XLA's in-process CPU
 * communicator executes collective thunks *blocking* on the shared
 * intra-op Eigen pool, which is sized from sched_getaffinity; with
 * fewer pool threads than collective participants the rendezvous
 * starves and the 40s watchdog aborts the process.  Reporting
 * n_devices CPUs gives the pool enough threads to park in rendezvous
 * while the remaining participants make progress (timesliced).
 *
 * Build: cc -shared -fPIC -o fake_nproc.so fake_nproc.c
 */
#define _GNU_SOURCE
#include <sched.h>
#include <stdlib.h>
#include <unistd.h>

static int fake_n(void) {
    const char *e = getenv("FAKE_NPROC");
    int n = (e != 0) ? atoi(e) : 0;
    return n > 0 ? n : 8;
}

int sched_getaffinity(pid_t pid, size_t cpusetsize, cpu_set_t *mask) {
    (void)pid;
    int n = fake_n();
    CPU_ZERO_S(cpusetsize, mask);
    for (int i = 0; i < n && (size_t)i < cpusetsize * 8; i++)
        CPU_SET_S(i, cpusetsize, mask);
    return 0;
}

int get_nprocs(void) { return fake_n(); }
