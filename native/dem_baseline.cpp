// Measured CPU baseline for the DEM hot loop.
//
// The reference (sediFoam) cannot be built in this image: its substrate
// runtimes (OpenFOAM, LAMMPS lammps-1Feb14) are external dependencies
// not shipped in the repo and there is no network access. At production
// scale its cost is dominated by the granular pair loop
// (interfaceToLammps/pair_gran_hertzFix_history.cpp:109-287, run
// subCycles*subSteps times per fluid step), so this program reimplements
// exactly that hot loop the way LAMMPS runs it — cell-list neighbor
// search with Verlet skin, half neighbor lists, per-contact tangential
// shear history with Coulomb rescaling, velocity-Verlet nve/sphere — in
// plain C++ (-O3 -march=native), and measures particle-substeps/s on
// this host. bench.py's vs_baseline divides by this number scaled to a
// documented node-core count (see BASELINE.md).
//
// Scenario matches bench.py: 131072 spheres d=1 mm, rho=2500, jittered
// just-touching lattice bed (2.02 r pitch) in a 0.064x0.128x0.064 m box, kn=1e5,
// gamman=0.7, xmu=0.3, dt=5e-6, gravity on, bottom wall.

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

static const int    N        = 131072;
static const double RADIUS   = 5e-4;
static const double DENSITY  = 2500.0;
static const double KN       = 1e5;
static const double GAMMAN   = 0.7;
static const double XMU      = 0.3;
static const double DT       = 5e-6;
static const double BOX[3]   = {0.064, 0.128, 0.064};
static const double CUTOFF   = 2 * RADIUS * 1.6;
static const double SKIN     = 0.6 * RADIUS;
static const int    MAXNBR   = 64;

struct Soa {
  std::vector<double> x, y, z, vx, vy, vz, wx, wy, wz, fx, fy, fz,
      tx, ty, tz;
  Soa() {
    for (auto *v : {&x, &y, &z, &vx, &vy, &vz, &wx, &wy, &wz,
                    &fx, &fy, &fz, &tx, &ty, &tz})
      v->assign(N, 0.0);
  }
};

// per-contact shear history: slot-parallel with the neighbor list
static std::vector<int>    nbr;        // (N, MAXNBR) partner ids (half list)
static std::vector<int>    nnbr;       // per-particle count
static std::vector<double> shear;      // (N, MAXNBR, 3)

static void build_neighbors(const Soa &s) {
  const double pitch = CUTOFF + SKIN;
  int nbx = (int)(BOX[0] / pitch) + 1, nby = (int)(BOX[1] / pitch) + 1,
      nbz = (int)(BOX[2] / pitch) + 1;
  int nbins = nbx * nby * nbz;
  std::vector<int> head(nbins, -1), next(N, -1);
  auto binof = [&](int i) {
    int bx = (int)(s.x[i] / pitch), by = (int)(s.y[i] / pitch),
        bz = (int)(s.z[i] / pitch);
    bx = bx < 0 ? 0 : (bx >= nbx ? nbx - 1 : bx);
    by = by < 0 ? 0 : (by >= nby ? nby - 1 : by);
    bz = bz < 0 ? 0 : (bz >= nbz ? nbz - 1 : bz);
    return (bx * nby + by) * nbz + bz;
  };
  for (int i = 0; i < N; i++) {
    int b = binof(i);
    next[i] = head[b];
    head[b] = i;
  }
  const double cutsq = pitch * pitch;
  // preserve old shear by partner matching (LAMMPS neighbor-history)
  std::vector<int> old_nbr = nbr;
  std::vector<int> old_n = nnbr;
  std::vector<double> old_shear = shear;
  for (int i = 0; i < N; i++) {
    int bx = (int)(s.x[i] / pitch), by = (int)(s.y[i] / pitch),
        bz = (int)(s.z[i] / pitch);
    int cnt = 0;
    for (int dx = -1; dx <= 1; dx++)
      for (int dy = -1; dy <= 1; dy++)
        for (int dz = -1; dz <= 1; dz++) {
          int cx = bx + dx, cy = by + dy, cz = bz + dz;
          if (cx < 0 || cy < 0 || cz < 0 || cx >= nbx || cy >= nby ||
              cz >= nbz)
            continue;
          for (int j = head[(cx * nby + cy) * nbz + cz]; j >= 0;
               j = next[j]) {
            if (j <= i) continue;  // half list
            double ddx = s.x[i] - s.x[j], ddy = s.y[i] - s.y[j],
                   ddz = s.z[i] - s.z[j];
            double rsq = ddx * ddx + ddy * ddy + ddz * ddz;
            if (rsq < cutsq && cnt < MAXNBR) {
              nbr[i * MAXNBR + cnt] = j;
              double *sh = &shear[(i * MAXNBR + cnt) * 3];
              sh[0] = sh[1] = sh[2] = 0.0;
              if (!old_nbr.empty()) {
                for (int k = 0; k < old_n[i]; k++)
                  if (old_nbr[i * MAXNBR + k] == j) {
                    const double *os = &old_shear[(i * MAXNBR + k) * 3];
                    sh[0] = os[0];
                    sh[1] = os[1];
                    sh[2] = os[2];
                    break;
                  }
              }
              cnt++;
            }
          }
        }
    nnbr[i] = cnt;
  }
}

int main(int argc, char **argv) {
  int nsteps = argc > 1 ? atoi(argv[1]) : 200;
  Soa s;
  // jittered lattice bed (same as bench.py build_case)
  std::mt19937 rng(42);
  std::uniform_real_distribution<double> jit(-0.05 * RADIUS, 0.05 * RADIUS);
  double pitch = 2.02 * RADIUS;  // just-touching bed: real contact density
  int nxp = (int)((BOX[0] - 2 * RADIUS) / pitch);
  int nzp = (int)((BOX[2] - 2 * RADIUS) / pitch);
  for (int i = 0; i < N; i++) {
    int ix = i % nxp, iz = (i / nxp) % nzp, iy = i / (nxp * nzp);
    s.x[i] = 2 * RADIUS + ix * pitch + jit(rng);
    s.y[i] = 2 * RADIUS + iy * pitch + jit(rng);
    s.z[i] = 2 * RADIUS + iz * pitch + jit(rng);
  }
  const double mass = DENSITY * 4.0 / 3.0 * M_PI * RADIUS * RADIUS * RADIUS;
  const double inv_m = 1.0 / mass;
  const double inv_I = 1.0 / (0.4 * mass * RADIUS * RADIUS);
  const double meff = mass * 0.5;
  const double beta =
      -log(GAMMAN) / sqrt(log(GAMMAN) * log(GAMMAN) + M_PI * M_PI);
  const double sqrt56 = sqrt(5.0 / 6.0);
  const double kt = KN * 2.0 / 7.0;

  nbr.assign((size_t)N * MAXNBR, -1);
  nnbr.assign(N, 0);
  shear.assign((size_t)N * MAXNBR * 3, 0.0);
  build_neighbors(s);

  std::vector<double> x0(s.x), y0(s.y), z0(s.z);
  auto t0 = std::chrono::steady_clock::now();
  long rebuilds = 0;

  for (int step = 0; step < nsteps; step++) {
    // initial integrate
    for (int i = 0; i < N; i++) {
      s.vx[i] += 0.5 * DT * s.fx[i] * inv_m;
      s.vy[i] += 0.5 * DT * s.fy[i] * inv_m;
      s.vz[i] += 0.5 * DT * s.fz[i] * inv_m;
      s.x[i] += DT * s.vx[i];
      s.y[i] += DT * s.vy[i];
      s.z[i] += DT * s.vz[i];
      s.wx[i] += 0.5 * DT * s.tx[i] * inv_I;
      s.wy[i] += 0.5 * DT * s.ty[i] * inv_I;
      s.wz[i] += 0.5 * DT * s.tz[i] * inv_I;
    }
    // Verlet-skin rebuild check
    double maxd2 = 0.0;
    for (int i = 0; i < N; i++) {
      double ddx = s.x[i] - x0[i], ddy = s.y[i] - y0[i],
             ddz = s.z[i] - z0[i];
      double d2 = ddx * ddx + ddy * ddy + ddz * ddz;
      if (d2 > maxd2) maxd2 = d2;
    }
    if (maxd2 > 0.25 * SKIN * SKIN) {
      build_neighbors(s);
      x0 = s.x;
      y0 = s.y;
      z0 = s.z;
      rebuilds++;
    }
    // forces: gravity + bottom wall + pair hertz/history
    for (int i = 0; i < N; i++) {
      s.fx[i] = 0.0;
      s.fy[i] = -9.81 * mass;
      s.fz[i] = 0.0;
      s.tx[i] = s.ty[i] = s.tz[i] = 0.0;
      double ovw = RADIUS - s.y[i];
      if (ovw > 0)  // simple bottom wall (hertzian normal)
        s.fy[i] += KN * ovw;
    }
    for (int i = 0; i < N; i++) {
      for (int k = 0; k < nnbr[i]; k++) {
        int j = nbr[i * MAXNBR + k];
        double delx = s.x[i] - s.x[j], dely = s.y[i] - s.y[j],
               delz = s.z[i] - s.z[j];
        double rsq = delx * delx + dely * dely + delz * delz;
        double radsum = 2 * RADIUS;
        if (rsq >= radsum * radsum) {
          double *sh = &shear[(i * MAXNBR + k) * 3];
          sh[0] = sh[1] = sh[2] = 0.0;
          continue;
        }
        double r = sqrt(rsq), rinv = 1.0 / r, rsqinv = 1.0 / rsq;
        // relative velocities (pair_gran_hertzFix_history.cpp:191-255)
        double vr1 = s.vx[i] - s.vx[j], vr2 = s.vy[i] - s.vy[j],
               vr3 = s.vz[i] - s.vz[j];
        double vnnr = vr1 * delx + vr2 * dely + vr3 * delz;
        double vn1 = delx * vnnr * rsqinv, vn2 = dely * vnnr * rsqinv,
               vn3 = delz * vnnr * rsqinv;
        double vt1 = vr1 - vn1, vt2 = vr2 - vn2, vt3 = vr3 - vn3;
        double wr1 = RADIUS * (s.wx[i] + s.wx[j]) * rinv;
        double wr2 = RADIUS * (s.wy[i] + s.wy[j]) * rinv;
        double wr3 = RADIUS * (s.wz[i] + s.wz[j]) * rinv;
        double vtr1 = vt1 - (delz * wr2 - dely * wr3);
        double vtr2 = vt2 - (delx * wr3 - delz * wr1);
        double vtr3 = vt3 - (dely * wr1 - delx * wr2);
        double overlap = radsum - r;
        double poly = overlap * RADIUS * RADIUS / radsum;
        double sp = sqrt(poly);
        double sn = (2.0 / 1.82) * KN * sp;
        double st = (8.0 / 8.84) * KN * sp;
        double damp = 2.0 * sqrt56 * beta * vnnr * rsqinv;
        double ccel =
            sp * (4.0 / 5.46) * KN * overlap * rinv - sqrt(sn * meff) * damp;
        // shear history
        double *sh = &shear[(i * MAXNBR + k) * 3];
        sh[0] += vtr1 * DT;
        sh[1] += vtr2 * DT;
        sh[2] += vtr3 * DT;
        double shrmag =
            sqrt(sh[0] * sh[0] + sh[1] * sh[1] + sh[2] * sh[2]);
        double rsht = (sh[0] * delx + sh[1] * dely + sh[2] * delz) * rsqinv;
        sh[0] -= rsht * delx;
        sh[1] -= rsht * dely;
        sh[2] -= rsht * delz;
        double tdamp = sqrt(st * meff) * 2.0 * sqrt56 * beta;
        double fs1 = -sp * (8.0 / 8.84) * kt * sh[0] - tdamp * vtr1;
        double fs2 = -sp * (8.0 / 8.84) * kt * sh[1] - tdamp * vtr2;
        double fs3 = -sp * (8.0 / 8.84) * kt * sh[2] - tdamp * vtr3;
        double fsmag = sqrt(fs1 * fs1 + fs2 * fs2 + fs3 * fs3);
        double fn = XMU * fabs(ccel * r);
        if (fsmag > fn && shrmag > 1e-300) {
          double sc = fn / fsmag;
          double dcoef = tdamp / kt * (8.84 / 8.0);
          sh[0] = sc * (sh[0] + dcoef * vtr1) - dcoef * vtr1;
          sh[1] = sc * (sh[1] + dcoef * vtr2) - dcoef * vtr2;
          sh[2] = sc * (sh[2] + dcoef * vtr3) - dcoef * vtr3;
          fs1 *= sc;
          fs2 *= sc;
          fs3 *= sc;
        }
        double Fx = delx * ccel + fs1, Fy = dely * ccel + fs2,
               Fz = delz * ccel + fs3;
        s.fx[i] += Fx;
        s.fy[i] += Fy;
        s.fz[i] += Fz;
        s.fx[j] -= Fx;
        s.fy[j] -= Fy;
        s.fz[j] -= Fz;
        double tq1 = dely * fs3 - delz * fs2, tq2 = delz * fs1 - delx * fs3,
               tq3 = delx * fs2 - dely * fs1;
        s.tx[i] -= RADIUS * rinv * tq1;
        s.ty[i] -= RADIUS * rinv * tq2;
        s.tz[i] -= RADIUS * rinv * tq3;
        s.tx[j] -= RADIUS * rinv * tq1;
        s.ty[j] -= RADIUS * rinv * tq2;
        s.tz[j] -= RADIUS * rinv * tq3;
      }
    }
    // final integrate
    for (int i = 0; i < N; i++) {
      s.vx[i] += 0.5 * DT * s.fx[i] * inv_m;
      s.vy[i] += 0.5 * DT * s.fy[i] * inv_m;
      s.vz[i] += 0.5 * DT * s.fz[i] * inv_m;
      s.wx[i] += 0.5 * DT * s.tx[i] * inv_I;
      s.wy[i] += 0.5 * DT * s.ty[i] * inv_I;
      s.wz[i] += 0.5 * DT * s.tz[i] * inv_I;
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  double ke = 0.0;
  for (int i = 0; i < N; i++)
    ke += s.vx[i] * s.vx[i] + s.vy[i] * s.vy[i] + s.vz[i] * s.vz[i];
  printf("{\"particles\": %d, \"steps\": %d, \"seconds\": %.3f, "
         "\"psteps_per_sec\": %.0f, \"rebuilds\": %ld, \"ke\": %.6e}\n",
         N, nsteps, secs, (double)N * nsteps / secs, rebuilds, ke);
  return 0;
}
