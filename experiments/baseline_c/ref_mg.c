/* Measured single-node baseline for BASELINE.md: a C port of the
 * reference octree-mg's hot loops and FMG visit structure, run on this
 * host's CPU (the image has no Fortran/MPI toolchain, so the reference
 * itself is unbuildable; gcc is available).
 *
 * What is ported (structure and arithmetic, not text):
 *   - boxed storage: every box is (nc+2)^3 cells x 4 f64 fields
 *     (phi, rhs, old, res), matching mg_num_vars=4 and the 1-deep
 *     ghost layer (m_data_structures.f90:8,300-340).
 *   - box_gs_lpl: lexicographic GS and red-black GSRB smoothers
 *     (m_laplacian.f90:52-114; parity = iand(ieor(cntr, k+j), 1)).
 *   - box_lpl residual (m_laplacian.f90:155-195).
 *   - full-weighting restriction (m_restrict.f90, 2^3 average) and the
 *     sparse D-linear prolongation with 0.25 weights
 *     (m_prolong.f90:159-240).
 *   - ghost fill: same-level face copies + Dirichlet bc_to_gc
 *     gc = 2*b - interior (m_ghost_cells.f90:682-698); one fill after
 *     every smoother substep (smooth_boxes, m_multigrid.f90:404-424).
 *   - FAS FMG and V-cycle visit counts: n_cycle_down = n_cycle_up = 2,
 *     coarse loop to rel/abs 1e-8 max 1000 (m_multigrid.f90:84-243,
 *     m_data_structures.f90:316-327).
 *   - level structure of mg_build_rectangle: box_size boxes down to
 *     one box, then box-size halving to the coarsest 2^3 grid
 *     (m_build_tree.f90:42-77).
 *
 * Parallelism: OpenMP over boxes within each level — the single-node
 * analogue of the reference's MPI ranks-over-boxes, but GENEROUS to
 * the reference: neighbor ghost copies are direct shared-memory plane
 * copies with zero message overhead, and there is no rank imbalance.
 * Each box's GS sweep is sequential inside, exactly like one rank's.
 *
 * Usage: ./ref_mg N box n_its [gs|gsrb]     (default 512 16 8 gs)
 *        ./ref_mg triad                      (memory-bandwidth probe)
 */
#include <math.h>
#include <omp.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    int nb;         /* boxes per side */
    int nc;         /* cells per box side */
    long nbox;      /* nb^3 */
    long s, s3;     /* nc+2, (nc+2)^3 */
    double idr2;    /* 1/dr^2 */
    double *phi, *rhs, *old, *res;
} Level;

static Level *LV;
static int NLVL, TOP; /* levels 0..TOP; TOP is finest */

static inline long bid(const Level *L, int bz, int by, int bx) {
    return ((long)bz * L->nb + by) * L->nb + bx;
}
static inline long cidx(const Level *L, long b, int k, int j, int i) {
    return ((b * L->s + k) * L->s + j) * L->s + i;
}

static void build_levels(int N, int box) {
    /* mg_build_rectangle levels: nb halves while divisible, then nc
     * halves to the coarsest 2-cell grid (m_build_tree.f90:42-77) */
    int sizes[64], ncs[64], n = 0;
    int g = N, nc = box;
    while (1) {
        sizes[n] = g; ncs[n] = nc; n++;
        if (g == 2) break;
        if (g / nc >= 2 && (g / nc) % 2 == 0) g /= 2;      /* halve nb */
        else { g /= 2; nc /= 2; }                           /* halve nc */
        if (nc < 2) { nc = 2; }
    }
    NLVL = n; TOP = n - 1;
    LV = calloc(n, sizeof(Level));
    for (int l = 0; l < n; l++) {
        Level *L = &LV[n - 1 - l];     /* store coarsest at index 0 */
        int gsz = sizes[l];
        L->nc = ncs[l];
        L->nb = gsz / ncs[l];
        L->nbox = (long)L->nb * L->nb * L->nb;
        L->s = L->nc + 2;
        L->s3 = L->s * L->s * L->s;
        double dr = 1.0 / gsz;
        L->idr2 = 1.0 / (dr * dr);
        L->phi = calloc(L->nbox * L->s3, sizeof(double));
        L->rhs = calloc(L->nbox * L->s3, sizeof(double));
        L->old = calloc(L->nbox * L->s3, sizeof(double));
        L->res = calloc(L->nbox * L->s3, sizeof(double));
    }
}

/* ---- ghost fill: same-level plane copies + Dirichlet-0 bc_to_gc ---- */
static void fill_ghost(int lvl, double *f) {
    Level *L = &LV[lvl];
    const int nc = L->nc, nb = L->nb;
    const long s = L->s;
#pragma omp parallel for collapse(2) schedule(static)
    for (int bz = 0; bz < nb; bz++)
        for (int by = 0; by < nb; by++)
            for (int bx = 0; bx < nb; bx++) {
                long b = bid(L, bz, by, bx);
                /* x faces */
                long bl = bx > 0 ? bid(L, bz, by, bx - 1) : -1;
                long br = bx < nb - 1 ? bid(L, bz, by, bx + 1) : -1;
                for (int k = 1; k <= nc; k++)
                    for (int j = 1; j <= nc; j++) {
                        f[cidx(L, b, k, j, 0)] = bl >= 0 ?
                            f[cidx(L, bl, k, j, nc)]
                            : -f[cidx(L, b, k, j, 1)];
                        f[cidx(L, b, k, j, nc + 1)] = br >= 0 ?
                            f[cidx(L, br, k, j, 1)]
                            : -f[cidx(L, b, k, j, nc)];
                    }
                /* y faces */
                bl = by > 0 ? bid(L, bz, by - 1, bx) : -1;
                br = by < nb - 1 ? bid(L, bz, by + 1, bx) : -1;
                for (int k = 1; k <= nc; k++) {
                    double *dst0 = &f[cidx(L, b, k, 0, 1)];
                    double *dst1 = &f[cidx(L, b, k, nc + 1, 1)];
                    if (bl >= 0)
                        memcpy(dst0, &f[cidx(L, bl, k, nc, 1)],
                               nc * sizeof(double));
                    else {
                        const double *in = &f[cidx(L, b, k, 1, 1)];
                        for (int i = 0; i < nc; i++) dst0[i] = -in[i];
                    }
                    if (br >= 0)
                        memcpy(dst1, &f[cidx(L, br, k, 1, 1)],
                               nc * sizeof(double));
                    else {
                        const double *in = &f[cidx(L, b, k, nc, 1)];
                        for (int i = 0; i < nc; i++) dst1[i] = -in[i];
                    }
                }
                /* z faces */
                bl = bz > 0 ? bid(L, bz - 1, by, bx) : -1;
                br = bz < nb - 1 ? bid(L, bz + 1, by, bx) : -1;
                for (int j = 1; j <= nc; j++) {
                    double *dst0 = &f[cidx(L, b, 0, j, 1)];
                    double *dst1 = &f[cidx(L, b, nc + 1, j, 1)];
                    if (bl >= 0)
                        memcpy(dst0, &f[cidx(L, bl, nc, j, 1)],
                               nc * sizeof(double));
                    else {
                        const double *in = &f[cidx(L, b, 1, j, 1)];
                        for (int i = 0; i < nc; i++) dst0[i] = -in[i];
                    }
                    if (br >= 0)
                        memcpy(dst1, &f[cidx(L, br, 1, j, 1)],
                               nc * sizeof(double));
                    else {
                        const double *in = &f[cidx(L, b, nc, j, 1)];
                        for (int i = 0; i < nc; i++) dst1[i] = -in[i];
                    }
                }
            }
    (void)s;
}

/* ---- box_gs_lpl (m_laplacian.f90:52-114) ---- */
static int REDBLACK = 0;
static void smooth_lvl(int lvl, int cntr) {
    Level *L = &LV[lvl];
    const int nc = L->nc;
    const double idr2 = L->idr2;
    const double fac = 0.5 / (3.0 * idr2);
#pragma omp parallel for schedule(static)
    for (long b = 0; b < L->nbox; b++) {
        double *phi = &L->phi[b * L->s3];
        const double *rhs = &L->rhs[b * L->s3];
        const long s = L->s, s2 = s * s;
        for (int k = 1; k <= nc; k++)
            for (int j = 1; j <= nc; j++) {
                int i0 = 1, di = 1;
                if (REDBLACK) {
                    di = 2;
                    i0 = 2 - ((cntr ^ (k + j)) & 1);
                }
                double *p = &phi[k * s2 + j * s];
                const double *r = &rhs[k * s2 + j * s];
                for (int i = i0; i <= nc; i += di)
                    p[i] = fac * (idr2 * (p[i + 1] + p[i - 1]
                                          + p[i + s] + p[i - s]
                                          + p[i + s2] + p[i - s2])
                                  - r[i]);
            }
    }
}

/* smooth_boxes: substep -> smooth all boxes -> ghost fill
 * (m_multigrid.f90:404-424); gsrb does 2 substeps per cycle */
static void smooth_boxes(int lvl, int n_cycle) {
    int sub = REDBLACK ? 2 : 1;
    for (int n = 1; n <= n_cycle * sub; n++) {
        smooth_lvl(lvl, n);
        fill_ghost(lvl, LV[lvl].phi);
    }
}

/* ---- box_lpl residual: res = rhs - L(phi) (m_laplacian.f90:155) ---- */
static void residual_lvl(int lvl) {
    Level *L = &LV[lvl];
    const int nc = L->nc;
    const double idr2 = L->idr2;
#pragma omp parallel for schedule(static)
    for (long b = 0; b < L->nbox; b++) {
        const double *phi = &L->phi[b * L->s3];
        const double *rhs = &L->rhs[b * L->s3];
        double *res = &L->res[b * L->s3];
        const long s = L->s, s2 = s * s;
        for (int k = 1; k <= nc; k++)
            for (int j = 1; j <= nc; j++) {
                const double *p = &phi[k * s2 + j * s];
                const double *r = &rhs[k * s2 + j * s];
                double *o = &res[k * s2 + j * s];
                for (int i = 1; i <= nc; i++)
                    o[i] = r[i] - idr2 * (p[i + 1] + p[i - 1]
                                          + p[i + s] + p[i - s]
                                          + p[i + s2] + p[i - s2]
                                          - 6.0 * p[i]);
            }
    }
}

static double max_residual_lvl(int lvl) {
    Level *L = &LV[lvl];
    residual_lvl(lvl);
    const int nc = L->nc;
    double mx = 0.0;
#pragma omp parallel for schedule(static) reduction(max : mx)
    for (long b = 0; b < L->nbox; b++) {
        const double *res = &L->res[b * L->s3];
        const long s = L->s, s2 = s * s;
        for (int k = 1; k <= nc; k++)
            for (int j = 1; j <= nc; j++)
                for (int i = 1; i <= nc; i++) {
                    double v = fabs(res[k * s2 + j * s + i]);
                    if (v > mx) mx = v;
                }
    }
    return mx;
}

/* global cell <-> (box, local) on a level */
static inline double getg(const Level *L, const double *f, int gz,
                          int gy, int gx) {
    int nc = L->nc;
    return f[cidx(L, bid(L, gz / nc, gy / nc, gx / nc),
                  gz % nc + 1, gy % nc + 1, gx % nc + 1)];
}
static inline void addg(const Level *L, double *f, int gz, int gy,
                        int gx, double v) {
    int nc = L->nc;
    f[cidx(L, bid(L, gz / nc, gy / nc, gx / nc),
           gz % nc + 1, gy % nc + 1, gx % nc + 1)] += v;
}
static inline void setg(const Level *L, double *f, int gz, int gy,
                        int gx, double v) {
    int nc = L->nc;
    f[cidx(L, bid(L, gz / nc, gy / nc, gx / nc),
           gz % nc + 1, gy % nc + 1, gx % nc + 1)] = v;
}

/* full-weighting restriction: coarse = mean of 2^3 fine children */
static void restrict_to(int lf, const double *ff, double *fc) {
    Level *F = &LV[lf], *C = &LV[lf - 1];
    int Nc = C->nb * C->nc;
#pragma omp parallel for collapse(2) schedule(static)
    for (int gz = 0; gz < Nc; gz++)
        for (int gy = 0; gy < Nc; gy++)
            for (int gx = 0; gx < Nc; gx++) {
                double sum = 0.0;
                for (int dz = 0; dz < 2; dz++)
                    for (int dy = 0; dy < 2; dy++)
                        for (int dx = 0; dx < 2; dx++)
                            sum += getg(F, ff, 2 * gz + dz,
                                        2 * gy + dy, 2 * gx + dx);
                setg(C, fc, gz, gy, gx, 0.125 * sum);
            }
}

/* mg_prolong_sparse + add (m_prolong.f90:159-240): fine += 0.25 *
 * (coarse + x-neighbor + y-neighbor + z-neighbor), parity-picked;
 * reads coarse ghosts at box edges like the reference */
static void prolong_add(int lc, const double *fc, double *ff) {
    Level *C = &LV[lc], *F = &LV[lc + 1];
    int Nf = F->nb * F->nc;
    const int ncc = C->nc;
#pragma omp parallel for collapse(2) schedule(static)
    for (int gz = 0; gz < Nf; gz++)
        for (int gy = 0; gy < Nf; gy++) {
            int cz = gz / 2, cy = gy / 2;
            int bz = cz / ncc, by = cy / ncc;
            int lz = cz % ncc + 1, ly = cy % ncc + 1;
            int dzo = (gz & 1) ? 1 : -1;
            int dyo = (gy & 1) ? 1 : -1;
            for (int gx = 0; gx < Nf; gx++) {
                int cx = gx / 2;
                long b = bid(C, bz, by, cx / ncc);
                int lx = cx % ncc + 1;
                int dxo = (gx & 1) ? 1 : -1;
                double f0 = fc[cidx(C, b, lz, ly, lx)];
                double fx = fc[cidx(C, b, lz, ly, lx + dxo)];
                double fy = fc[cidx(C, b, lz, ly + dyo, lx)];
                double fz = fc[cidx(C, b, lz + dzo, ly, lx)];
                addg(F, ff, gz, gy, gx, 0.25 * (f0 + fx + fy + fz));
            }
        }
}

/* rhs_c = L(phi_c) + res_c on interiors; old_c = phi_c everywhere
 * (update_coarse tail, m_multigrid.f90:369-383) */
static void finish_coarse_rhs(int lc) {
    Level *L = &LV[lc];
    const int nc = L->nc;
    const double idr2 = L->idr2;
#pragma omp parallel for schedule(static)
    for (long b = 0; b < L->nbox; b++) {
        const double *phi = &L->phi[b * L->s3];
        const double *res = &L->res[b * L->s3];
        double *rhs = &L->rhs[b * L->s3];
        const long s = L->s, s2 = s * s;
        for (int k = 1; k <= nc; k++)
            for (int j = 1; j <= nc; j++)
                for (int i = 1; i <= nc; i++) {
                    long c = k * s2 + j * s + i;
                    rhs[c] = idr2 * (phi[c + 1] + phi[c - 1]
                                     + phi[c + s] + phi[c - s]
                                     + phi[c + s2] + phi[c - s2]
                                     - 6.0 * phi[c]) + res[c];
                }
        memcpy(&L->old[b * L->s3], &L->phi[b * L->s3],
               L->s3 * sizeof(double));
    }
}

static void update_coarse(int lvl) {
    residual_lvl(lvl);
    restrict_to(lvl, LV[lvl].phi, LV[lvl - 1].phi);
    restrict_to(lvl, LV[lvl].res, LV[lvl - 1].res);
    fill_ghost(lvl - 1, LV[lvl - 1].phi);
    finish_coarse_rhs(lvl - 1);
}

/* res_c = phi_c - old_c (incl ghosts), fine phi += prolong(res_c) */
static void correct_children(int lc) {
    Level *L = &LV[lc];
#pragma omp parallel for schedule(static)
    for (long n = 0; n < L->nbox * L->s3; n++)
        L->res[n] = L->phi[n] - L->old[n];
    prolong_add(lc, LV[lc].res, LV[lc + 1].phi);
}

static void copy_old(int lvl) {
    Level *L = &LV[lvl];
    memcpy(L->old, L->phi, L->nbox * L->s3 * sizeof(double));
}

/* mg_fas_vcycle (m_multigrid.f90:150-243), standalone = false */
static void vcycle(int max_lvl) {
    for (int lvl = max_lvl; lvl >= 1; lvl--) {
        smooth_boxes(lvl, 2);            /* n_cycle_down = 2 */
        update_coarse(lvl);
    }
    double init_res = max_residual_lvl(0);
    for (int i = 0; i < 1000; i++) {     /* max_coarse_cycles */
        smooth_boxes(0, 4);              /* n_cycle_up + n_cycle_down */
        double res = max_residual_lvl(0);
        if (res < 1e-8 * init_res || res < 1e-8) break;
    }
    for (int lvl = 1; lvl <= max_lvl; lvl++) {
        correct_children(lvl - 1);
        fill_ghost(lvl, LV[lvl].phi);
        smooth_boxes(lvl, 2);            /* n_cycle_up = 2 */
    }
}

/* mg_fas_fmg (m_multigrid.f90:84-147), have_guess = true */
static void fas_fmg(void) {
    fill_ghost(TOP, LV[TOP].phi);
    for (int lvl = TOP; lvl >= 1; lvl--)
        update_coarse(lvl);
    for (int lvl = 0; lvl <= TOP; lvl++) {
        copy_old(lvl);
        if (lvl > 0) {
            correct_children(lvl - 1);
            fill_ghost(lvl, LV[lvl].phi);
        }
        vcycle(lvl);
    }
}

/* ---- memory-bandwidth probe (STREAM-triad style) ---- */
static void triad(void) {
    long n = 1L << 27; /* 3 x 1 GiB */
    double *a = malloc(n * 8), *b = malloc(n * 8), *c = malloc(n * 8);
#pragma omp parallel for schedule(static)
    for (long i = 0; i < n; i++) { a[i] = 1; b[i] = 2; c[i] = 0; }
    double best = 0;
    for (int rep = 0; rep < 5; rep++) {
        double t0 = omp_get_wtime();
#pragma omp parallel for schedule(static)
        for (long i = 0; i < n; i++) c[i] = a[i] + 3.0 * b[i];
        double gb = 3.0 * n * 8 / (omp_get_wtime() - t0) / 1e9;
        if (gb > best) best = gb;
    }
    printf("triad bandwidth: %.1f GB/s (%d threads)\n", best,
           omp_get_max_threads());
    free(a); free(b); free(c);
}

int main(int argc, char **argv) {
    if (argc > 1 && !strcmp(argv[1], "triad")) { triad(); return 0; }
    int N = argc > 1 ? atoi(argv[1]) : 512;
    int box = argc > 2 ? atoi(argv[2]) : 16;
    int n_its = argc > 3 ? atoi(argv[3]) : 8;
    REDBLACK = (argc > 4 && !strcmp(argv[4], "gsrb"));
    build_levels(N, box);
    /* deterministic pseudo-random rhs on the finest level interior */
    Level *T = &LV[TOP];
    unsigned long long st = 0x9e3779b97f4a7c15ULL;
    for (long b = 0; b < T->nbox; b++)
        for (int k = 1; k <= T->nc; k++)
            for (int j = 1; j <= T->nc; j++)
                for (int i = 1; i <= T->nc; i++) {
                    st ^= st << 13; st ^= st >> 7; st ^= st << 17;
                    T->rhs[cidx(T, b, k, j, i)] =
                        (double)(long long)st / 9.2e18;
                }
    /* warm run (phi = 0 makes have_guess moot) + residual check */
    fas_fmg();
    double r0 = max_residual_lvl(TOP);
    fas_fmg();
    double r1 = max_residual_lvl(TOP);
    double t0 = omp_get_wtime();
    for (int n = 0; n < n_its; n++)
        fas_fmg();
    double dt = omp_get_wtime() - t0;
    double unknowns = 0;
    for (int l = 0; l < NLVL; l++) {
        double g = (double)LV[l].nb * LV[l].nc;
        unknowns += g * g * g;
    }
    printf("mode=%s N=%d box=%d threads=%d\n",
           REDBLACK ? "gsrb" : "gs", N, box, omp_get_max_threads());
    printf("time/FMG %.4f s   unknowns/s %.4g\n", dt / n_its,
           unknowns * n_its / dt);
    printf("residual contraction check: %.3e -> %.3e (per-FMG ~%.0fx)\n",
           r0, r1, r0 / r1);
    return 0;
}
