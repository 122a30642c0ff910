"""Cross-validation: pion_tpu vs the reference C++ binary (text build).
Cases: Toro1 (156 steps, hybrid RS), Toro3 (strong shock), Brio-Wu
(ideal-MHD HLLD).  Prints L1/L2/max relative norms per field."""
import sys, numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from pion_tpu import Eqn, SimConfig, Simulation
from pion_tpu.constants import BX, BY, PG, RO, VX

def run_case(name, ref_file, eqn, solver, gamma, tmax, L, R, x0, nsteps_ref):
    ref = np.loadtxt(ref_file)
    n = 200
    cfg = SimConfig(ndim=1, eqn=eqn, solver=solver, gamma=gamma,
                    shape=(n,), xmin=(0.0,), xmax=(1.0,),
                    bcs=(("outflow", "outflow"),), cfl=0.7, ooa=2,
                    av="falle", etav=0.3, tmax=tmax, dtype="float64")
    x = cfg.cell_centers(0)
    P0 = np.zeros((cfg.nvar, n))
    m = x <= x0
    for slot, lv, rv in zip(range(len(L)), L, R):
        P0[slot] = np.where(m, lv, rv)
    sim = Simulation(cfg, jnp.asarray(P0))
    sim.run()
    out = np.asarray(sim.P)
    print(f"== {name}: t={sim.t:.4f} steps={sim.step_count} (ref {nsteps_ref})")
    cols = {"rho": (RO, 1), "pg": (PG, 2), "vx": (VX, 3)}
    bnorm = np.sqrt(4.0 * np.pi)  # text output stores B in Gauss (*sqrt(4pi))
    if eqn != Eqn.EULER:
        cols["By"] = (BY, 7)
    worst = 0.0
    for nm, (slot, col) in cols.items():
        a, b = out[slot], ref[:, col]
        if nm in ("Bx", "By", "Bz"):
            b = b / bnorm
        scale = max(np.abs(b).max(), 1e-300)
        l1 = np.abs(a - b).mean() / scale
        mx = np.abs(a - b).max() / scale
        worst = max(worst, l1)
        print(f"  {nm}: rel L1={l1:.3e}  max={mx:.3e}")
    return worst

def run_case_2d(name, ic_file, ref_file, eqn, solver, gamma, tmax,
                n, nsteps_ref):
    """2D crossval: start from the reference binary's OWN t=0 text
    snapshot (exact same ICs incl. its 32x32 subcell interface averaging,
    dataio_text.cpp:640-695), evolve with pion_tpu, compare at the end
    time.  Text columns: x y rho pg vx vy vz [...] (x fastest)."""
    ic = np.loadtxt(ic_file)
    ref = np.loadtxt(ref_file)
    cfg = SimConfig(ndim=2, eqn=eqn, solver=solver, gamma=gamma,
                    shape=(n, n), xmin=(0.0, 0.0), xmax=(1.0, 1.0),
                    bcs=(("outflow", "outflow"),) * 2, cfl=0.7, ooa=2,
                    av="falle", etav=0.3, tmax=tmax, dtype="float64")

    def to_grid(col):
        return col.reshape(n, n)  # rows: y slow, x fast -> (y, x)

    P0 = np.zeros((cfg.nvar, n, n))
    for slot, col in ((RO, 2), (PG, 3), (VX, 4), (VX + 1, 5), (VX + 2, 6)):
        P0[slot] = to_grid(ic[:, col])
    sim = Simulation(cfg, jnp.asarray(P0))
    sim.run()
    out = np.asarray(sim.P)
    print(f"== {name}: t={sim.t:.4f} steps={sim.step_count} (ref {nsteps_ref})")
    worst = 0.0
    for nm, (slot, col) in {"rho": (RO, 2), "pg": (PG, 3), "vx": (VX, 4),
                            "vy": (VX + 1, 5)}.items():
        a, b = out[slot], to_grid(ref[:, col])
        scale = max(np.abs(b).max(), 1e-300)
        l1 = np.abs(a - b).mean() / scale
        mx = np.abs(a - b).max() / scale
        worst = max(worst, l1)
        print(f"  {nm}: rel L1={l1:.3e}  max={mx:.3e}")
    return worst


w = []
w.append(run_case("Toro1 (hybrid)", "/tmp/refrun/toro1ref.00000156.txt",
                  Eqn.EULER, "hybrid", 1.4, 0.2,
                  [1.0, 1.0, 0.75], [0.125, 0.1, 0.0], 0.3, 156))
w.append(run_case("Toro3 (hybrid, strong shock)",
                  "/tmp/refrun/toro3ref.00000183.txt",
                  Eqn.EULER, "hybrid", 1.4, 0.012,
                  [1.0, 1000.0, 0.0], [1.0, 0.01, 0.0], 0.5, 183))
# Brio-Wu, ideal MHD, HLLD (slots: rho,pg,vx,vy,vz,Bx,By,Bz)
w.append(run_case("BrioWu (i-mhd HLLD)", "/tmp/refrun/bwref.00000139.txt",
                  Eqn.MHD, "hlld", 2.0, 0.12,
                  [1.0, 1.0, 0, 0, 0, 0.75, 1.0, 0],
                  [0.125, 0.1, 0, 0, 0, 0.75, -1.0, 0], 0.5, 139))
w.append(run_case_2d("Toro1 2D oblique 40deg (hybrid)",
                     "/tmp/refrun/toro1_2dref.00000000.txt",
                     "/tmp/refrun/toro1_2dref.00000056.txt",
                     Eqn.EULER, "hybrid", 1.4, 0.1, 128, 56))
print(f"worst-case rel L1 across cases: {max(w):.3e}")
assert max(w) < 2e-2, "cross-validation L1 above gate"
print("CROSSVAL OK")


def run_case_cooling(name, ref_file, tmax, nsteps_ref):
    """Cooling-coupled crossval (reference: mp_only_cooling — adaptive
    RK/Euler, NO CVODE, so the stub build integrates it numerically):
    cgs colliding-flow radiative shock, build-local RIEMANN case 99
    (see setup_refbuild.sh), SD93-CIE curve, EP_MP_timestep_limit=1."""
    from pion_tpu.microphysics.cooling import CoolingConfig, MPOnlyCooling
    from pion_tpu.physics import Physics

    ref = np.loadtxt(ref_file)
    n = 200
    cfg = SimConfig(ndim=1, eqn=Eqn.EULER, solver="hybrid",
                    gamma=5.0 / 3.0, shape=(n,), xmin=(-1.0e17,),
                    xmax=(1.0e17,), bcs=(("outflow", "outflow"),),
                    cfl=0.7, ooa=2, av="falle", etav=0.3, tmax=tmax,
                    min_temperature=10.0, dtype="float64")
    phys = Physics(mp=MPOnlyCooling(CoolingConfig(
        gamma=cfg.gamma, min_temperature=10.0, max_temperature=1.0e9,
        curve="SD93_CIE")), dt_limit=1)
    x = cfg.cell_centers(0)
    P0 = np.zeros((cfg.nvar, n))
    m = x <= 0.0
    P0[RO] = 2.34e-22
    P0[PG] = 3.10e-12
    P0[VX] = np.where(m, 7.0e6, -7.0e6)
    sim = Simulation(cfg, jnp.asarray(P0), physics=phys)
    sim.run()
    out = np.asarray(sim.P)
    print(f"== {name}: t={sim.t:.4e} steps={sim.step_count} "
          f"(ref {nsteps_ref})")
    worst = 0.0
    for nm, (slot, col) in {"rho": (RO, 1), "pg": (PG, 2),
                            "vx": (VX, 3)}.items():
        a, b = out[slot], ref[:, col]
        scale = max(np.abs(b).max(), 1e-300)
        l1 = np.abs(a - b).mean() / scale
        mx = np.abs(a - b).max() / scale
        worst = max(worst, l1)
        print(f"  {nm}: rel L1={l1:.3e}  max={mx:.3e}")
    return worst


if "--cooling" in sys.argv:
    wc = run_case_cooling("RadShock SD93-CIE (mp_only_cooling)",
                          "/tmp/radshock/radshockref.00000073.txt",
                          5.0e9, 73)
    print(f"cooling-case rel L1: {wc:.3e}")
    assert wc < 2e-2, "cooling cross-validation L1 above gate"
    print("COOLING CROSSVAL OK")
