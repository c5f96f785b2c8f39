/*
 * nsp_serial — native serial backend of navierstokes_parallel_tpu.
 *
 * A from-scratch C implementation of the same staggered-grid (MAC)
 * incompressible Navier-Stokes solver the JAX paths implement (Griebel et
 * al. 1998): donor-cell momentum stencils, lexicographic Gauss-Seidel SOR
 * pressure solve, adaptive CFL time stepping.  It plays the role the
 * reference's src/serial/ build plays: the fast CPU oracle for parity
 * testing and the "serial" row of the benchmark CSVs.
 *
 * Semantics deliberately mirror the serial reference (see SURVEY.md):
 *   - signed interior max seeded with the [0][0] ghost corner (io.c:122)
 *   - SOR stop rule  L2(res) <= eps * (||p_0|| + 1.5)  (integration.c:164)
 *   - ghost fill once per sweep, sides only (integration.c:138-146)
 *   - projection guarded to i <= i_max-1 / j <= j_max-1 (main.c:131-136)
 *
 * Layout: flat row-major arrays of (i_max+2) x (j_max+2) doubles; cell
 * (i, j) lives at index i * (j_max+2) + j.  Exposed both as a shared
 * library (ctypes, see backends/serial_c.py) and as a standalone CLI with
 * the reference's stdout/stderr protocol.
 */

#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

typedef struct {
    int problem;
    double f;
    int i_max, j_max;
    double a, b, T, Re, g_x, g_y, tau, omega, epsilon;
    int max_it, n_print;
} nsp_params;

typedef struct {
    long steps;
    long total_sor_iters;
    long sor_failures;
    double t;
    double sor_seconds;
} nsp_stats;

#define IDX(i, j) ((size_t)(i) * stride + (size_t)(j))

/* signed interior max, seeded with the ghost corner (reference quirk) */
static double interior_max(const double *m, int i_max, int j_max) {
    size_t stride = (size_t)j_max + 2;
    double best = m[IDX(0, 0)];
    for (int i = 1; i <= i_max; i++)
        for (int j = 1; j <= j_max; j++)
            if (m[IDX(i, j)] > best) best = m[IDX(i, j)];
    return best;
}

static void apply_bcs(double *u, double *v, int i_max, int j_max, double lid) {
    size_t stride = (size_t)j_max + 2;
    /* left + right walls */
    for (int j = 1; j <= j_max; j++) {
        u[IDX(0, j)] = 0.0;
        v[IDX(0, j)] = -v[IDX(1, j)];
        u[IDX(i_max, j)] = 0.0;
        v[IDX(i_max + 1, j)] = -v[IDX(i_max, j)];
    }
    /* floor + moving lid */
    for (int i = 1; i <= i_max; i++) {
        v[IDX(i, 0)] = 0.0;
        u[IDX(i, 0)] = -u[IDX(i, 1)];
        v[IDX(i, j_max)] = 0.0;
        u[IDX(i, j_max + 1)] = 2.0 * lid - u[IDX(i, j_max)];
    }
}

/* Donor-cell momentum: tentative velocities F, G over their interior
 * domains; boundary entries stay zero (= u/v wall values for cavity BCs). */
static void momentum(const nsp_params *prm, const double *u, const double *v,
                     double *F, double *G, double dt, double gamma) {
    int i_max = prm->i_max, j_max = prm->j_max;
    size_t stride = (size_t)j_max + 2;
    double dx = prm->a / i_max, dy = prm->b / j_max;
    double inv_re = 1.0 / prm->Re;

    for (int i = 1; i <= i_max; i++) {
        for (int j = 1; j <= j_max; j++) {
            double uc = u[IDX(i, j)], vc = v[IDX(i, j)];
            if (i < i_max) {
                double ue = u[IDX(i + 1, j)], uw = u[IDX(i - 1, j)];
                double un = u[IDX(i, j + 1)], us = u[IDX(i, j - 1)];
                double ve = v[IDX(i + 1, j)];
                double vs = v[IDX(i, j - 1)], vse = v[IDX(i + 1, j - 1)];

                double ae = 0.5 * (uc + ue), aw = 0.5 * (uw + uc);
                double du2dx = (ae * ae - aw * aw) / dx +
                               gamma / dx * (fabs(ae) * 0.5 * (uc - ue) -
                                             fabs(aw) * 0.5 * (uw - uc));
                double vn_ = 0.5 * (vc + ve), vs_ = 0.5 * (vs + vse);
                double duvdy = (vn_ * 0.5 * (uc + un) - vs_ * 0.5 * (us + uc)) / dy +
                               gamma / dy * (fabs(vn_) * 0.5 * (uc - un) -
                                             fabs(vs_) * 0.5 * (us - uc));
                double lap = (ue - 2.0 * uc + uw) / (dx * dx) +
                             (un - 2.0 * uc + us) / (dy * dy);
                F[IDX(i, j)] = uc + dt * (inv_re * lap - du2dx - duvdy + prm->g_x);
            }
            if (j < j_max) {
                double vn = v[IDX(i, j + 1)], vs = v[IDX(i, j - 1)];
                double ve = v[IDX(i + 1, j)], vw = v[IDX(i - 1, j)];
                double un = u[IDX(i, j + 1)];
                double uw = u[IDX(i - 1, j)], unw = u[IDX(i - 1, j + 1)];

                double an = 0.5 * (vc + vn), as_ = 0.5 * (vs + vc);
                double dv2dy = (an * an - as_ * as_) / dy +
                               gamma / dy * (fabs(an) * 0.5 * (vc - vn) -
                                             fabs(as_) * 0.5 * (vs - vc));
                double ue_ = 0.5 * (u[IDX(i, j)] + un), uw_ = 0.5 * (uw + unw);
                double duvdx = (ue_ * 0.5 * (vc + ve) - uw_ * 0.5 * (vw + vc)) / dx +
                               gamma / dx * (fabs(ue_) * 0.5 * (vc - ve) -
                                             fabs(uw_) * 0.5 * (vw - vc));
                double lap = (ve - 2.0 * vc + vw) / (dx * dx) +
                             (vn - 2.0 * vc + vs) / (dy * dy);
                G[IDX(i, j)] = vc + dt * (inv_re * lap - duvdx - dv2dy + prm->g_y);
            }
        }
    }
}

static double l2_interior(const double *m, int i_max, int j_max) {
    size_t stride = (size_t)j_max + 2;
    double acc = 0.0;
    for (int i = 1; i <= i_max; i++)
        for (int j = 1; j <= j_max; j++)
            acc += m[IDX(i, j)] * m[IDX(i, j)];
    return sqrt(acc / i_max / j_max);
}

/* Lexicographic in-place Gauss-Seidel SOR; returns sweeps used, or -sweeps
 * if max_it was hit without convergence. */
long nsp_sor(const nsp_params *prm, double *p, const double *rhs, double *res) {
    int i_max = prm->i_max, j_max = prm->j_max;
    size_t stride = (size_t)j_max + 2;
    double dx = prm->a / i_max, dy = prm->b / j_max;
    double idx2 = 1.0 / (dx * dx), idy2 = 1.0 / (dy * dy);
    double coef = prm->omega / (2.0 * (idx2 + idy2));
    double thresh = prm->epsilon * (l2_interior(p, i_max, j_max) + 1.5);

    for (long it = 1; it <= prm->max_it; it++) {
        /* Neumann ghost refresh, sides only */
        for (int j = 1; j <= j_max; j++) {
            p[IDX(0, j)] = p[IDX(1, j)];
            p[IDX(i_max + 1, j)] = p[IDX(i_max, j)];
        }
        for (int i = 1; i <= i_max; i++) {
            p[IDX(i, 0)] = p[IDX(i, 1)];
            p[IDX(i, j_max + 1)] = p[IDX(i, j_max)];
        }

        for (int i = 1; i <= i_max; i++)
            for (int j = 1; j <= j_max; j++)
                p[IDX(i, j)] =
                    (1.0 - prm->omega) * p[IDX(i, j)] +
                    coef * ((p[IDX(i + 1, j)] + p[IDX(i - 1, j)]) * idx2 +
                            (p[IDX(i, j + 1)] + p[IDX(i, j - 1)]) * idy2 -
                            rhs[IDX(i, j)]);

        double acc = 0.0;
        for (int i = 1; i <= i_max; i++)
            for (int j = 1; j <= j_max; j++) {
                double r = (p[IDX(i + 1, j)] - 2.0 * p[IDX(i, j)] +
                            p[IDX(i - 1, j)]) * idx2 +
                           (p[IDX(i, j + 1)] - 2.0 * p[IDX(i, j)] +
                            p[IDX(i, j - 1)]) * idy2 -
                           rhs[IDX(i, j)];
                if (res) res[IDX(i, j)] = r;
                acc += r * r;
            }
        if (sqrt(acc / i_max / j_max) <= thresh) return it;
    }
    return -(long)prm->max_it;
}

/* One full time step in place; returns dt via *dt_out and SOR sweeps;
 * accumulates SOR-only seconds into *sor_secs (reference stderr protocol,
 * main.c:122-125 brackets only the SOR call). */
long nsp_step(const nsp_params *prm, double *u, double *v, double *p,
              double *F, double *G, double *rhs, double t, double *dt_out,
              double *sor_secs) {
    int i_max = prm->i_max, j_max = prm->j_max;
    size_t stride = (size_t)j_max + 2;
    double dx = prm->a / i_max, dy = prm->b / j_max;

    double u_max = interior_max(u, i_max, j_max);
    double v_max = interior_max(v, i_max, j_max);
    double visc = prm->Re / 2.0 / (1.0 / (dx * dx) + 1.0 / (dy * dy));
    double dt = visc;
    double cu = dx / fabs(u_max), cv = dy / fabs(v_max);
    if (cu < dt) dt = cu;
    if (cv < dt) dt = cv;
    dt *= prm->tau;
    double gamma = fmax(u_max * dt / dx, v_max * dt / dy);

    double lid = (prm->problem == 2) ? sin(prm->f * t) : 1.0;
    apply_bcs(u, v, i_max, j_max, lid);

    momentum(prm, u, v, F, G, dt, gamma);

    for (int i = 1; i <= i_max; i++)
        for (int j = 1; j <= j_max; j++)
            rhs[IDX(i, j)] = ((F[IDX(i, j)] - F[IDX(i - 1, j)]) / dx +
                              (G[IDX(i, j)] - G[IDX(i, j - 1)]) / dy) / dt;

    clock_t sor_t0 = clock();
    long sweeps = nsp_sor(prm, p, rhs, NULL);
    if (sor_secs) *sor_secs += (double)(clock() - sor_t0) / CLOCKS_PER_SEC;

    for (int i = 1; i <= i_max; i++)
        for (int j = 1; j <= j_max; j++) {
            if (i < i_max)
                u[IDX(i, j)] = F[IDX(i, j)] -
                               dt * (p[IDX(i + 1, j)] - p[IDX(i, j)]) / dx;
            if (j < j_max)
                v[IDX(i, j)] = G[IDX(i, j)] -
                               dt * (p[IDX(i, j + 1)] - p[IDX(i, j)]) / dy;
        }

    *dt_out = dt;
    return sweeps;
}

/* Full integration while t < T on caller-provided (zero-initialized or
 * resumed) state arrays. */
int nsp_solve(const nsp_params *prm, double *u, double *v, double *p,
              nsp_stats *stats) {
    size_t cells = ((size_t)prm->i_max + 2) * ((size_t)prm->j_max + 2);
    double *F = calloc(cells, sizeof(double));
    double *G = calloc(cells, sizeof(double));
    double *rhs = calloc(cells, sizeof(double));
    if (!F || !G || !rhs) { free(F); free(G); free(rhs); return -1; }

    double t = stats ? stats->t : 0.0;
    long steps = 0, total = 0, failures = 0;
    double sor_seconds = 0.0;
    while (t < prm->T) {
        double dt;
        long sweeps = nsp_step(prm, u, v, p, F, G, rhs, t, &dt, &sor_seconds);
        if (sweeps < 0) { failures++; sweeps = -sweeps; }
        total += sweeps;
        t += dt;
        steps++;
    }
    if (stats) {
        stats->steps = steps;
        stats->total_sor_iters = total;
        stats->sor_failures = failures;
        stats->t = t;
        stats->sor_seconds = sor_seconds;
    }
    free(F); free(G); free(rhs);
    return 0;
}

#ifdef NSP_MAIN
static int read_params(const char *path, nsp_params *prm) {
    FILE *fp = fopen(path, "r");
    if (!fp) { perror("parameter file"); return -1; }
    char line[512];
    double vals[15];
    int n = 0;
    while (n < 15 && fgets(line, sizeof line, fp)) {
        if (sscanf(line, "%lf", &vals[n]) == 1) n++;
    }
    fclose(fp);
    if (n < 15) { fprintf(stderr, "expected 15 parameter lines, got %d\n", n); return -1; }
    prm->problem = (int)vals[0];  prm->f = vals[1];
    prm->i_max = (int)vals[2];    prm->j_max = (int)vals[3];
    prm->a = vals[4];             prm->b = vals[5];
    prm->T = vals[6];             prm->Re = vals[7];
    prm->g_x = vals[8];           prm->g_y = vals[9];
    prm->tau = vals[10];          prm->omega = vals[11];
    prm->epsilon = vals[12];      prm->max_it = (int)vals[13];
    prm->n_print = (int)vals[14];
    return 0;
}

int main(int argc, char **argv) {
    nsp_params prm;
    const char *path = argc > 1 ? argv[1] : "parameters.txt";
    if (read_params(path, &prm)) return EXIT_FAILURE;

    size_t stride = (size_t)prm.j_max + 2;
    size_t cells = ((size_t)prm.i_max + 2) * stride;
    double *u = calloc(cells, sizeof(double));
    double *v = calloc(cells, sizeof(double));
    double *p = calloc(cells, sizeof(double));
    if (!u || !v || !p) return EXIT_FAILURE;

    nsp_stats stats = {0};
    if (nsp_solve(&prm, u, v, p, &stats)) return EXIT_FAILURE;

    /* reference stdout/stderr protocol (main.c:148-153) */
    printf("U-CENTER: %.6f\n", u[IDX(prm.i_max / 2, prm.j_max / 2)]);
    printf("V-CENTER: %.6f\n", v[IDX(prm.i_max / 2, prm.j_max / 2)]);
    fprintf(stderr, "%.6f", stats.sor_seconds);

    free(u); free(v); free(p);
    return 0;
}
#endif
