"""Test configuration: run everything on a virtual 8-device CPU mesh in f64.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host devices (``--xla_force_host_platform_device_count=8``),
exactly the strategy SURVEY §4 prescribes (and the reference lacks: it has
zero distributed tests).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# ---------------------------------------------------------------------------
# XLA:CPU segfault workaround (round 5): with several hundred compiled
# executables alive in one process, a later (individually innocuous)
# compile segfaults inside backend_compile_and_load — reproduced 3/3 at
# the same test with and without the native layer, and the same test
# passes in isolation or after any prefix subset. Dropping the live
# executables between test MODULES keeps the per-process compile
# population bounded; modules recompile their own graphs anyway, so the
# wall-time cost is small.
# ---------------------------------------------------------------------------
import pytest as _pytest


@_pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()


# ---------------------------------------------------------------------------
# Smoke tier: `pytest -m smoke` runs a ~2-3 minute subset covering one test
# per solver / preconditioner / sharded path, so CI and the build driver can
# validate per-commit without the ~40-minute full suite (VERDICT r2 item 10).
# Curated centrally here instead of decorating every file.
# ---------------------------------------------------------------------------
import pytest

_SMOKE = {
    "test_advice_r2.py::test_symmetric_detection_makes_rmatvec_matvec",
    "test_amg.py::test_amg_is_jittable",
    "test_block_cg.py::test_block_pcg_matches_direct",
    "test_block_gmres.py::test_block_gmres_matches_direct",
    "test_setup_paths.py::test_csr_to_dia_noncanonical_rows",
    "test_api.py::test_solve_dispatch_all_iterative_kinds",
    "test_api.py::test_ca_gmres_small",
    "test_cg.py::test_cg_small_spd_closed_form",
    "test_cg.py::test_pcg_jacobi_ill_conditioned_diagonal",
    "test_core.py::test_operators_are_pytrees",
    "test_core.py::test_stencil_3d_matches_csr",
    "test_fused.py::test_dia_spmv_dot_semantics",
    "test_gmg.py::test_gmg_pcg_2d",
    "test_gmres.py::test_gmres_small_nonsymmetric",
    "test_idr.py::test_idr_nonsymmetric",
    "test_gmres.py::test_fgmres_flexible_pc",
    "test_ilu_dia.py::test_ilu0_dia_is_jittable_pytree",
    "test_options.py::test_parse_pc_options",
    "test_parallel.py::test_sharded_cg_matches_single_device",
    "test_parallel.py::test_sharded_gmres",
    "test_parity.py::test_parity_pcg_jacobi",
    "test_preconditioners.py::test_ilu0_exact_on_tridiag",
    "test_preconditioners.py::test_sor_forward_sweep_matches_manual",
    "test_preconditioners.py::test_chebyshev_pc_accelerates_cg",
    "test_preconditioners.py::test_block_jacobi_accelerates_pcg",
    "test_preconditioners.py::test_asm_accelerates_pcg",
    "test_preconditioners.py::test_spai_poisson_acceleration",
    "test_refine.py::test_refine_device_poisson",
    "test_sharded_gmg.py::test_halo_rmatvec_matches_transpose",
    "test_solvers.py::test_bicgstab_nonsymmetric",
    "test_solvers.py::test_qmr_nonsymmetric",
    "test_solvers.py::test_tfqmr_nonsymmetric",
    "test_solvers.py::test_minres_spd",
    "test_solvers.py::test_cgnr_rectangular_least_squares",
    "test_solvers.py::test_lu_solve_and_cache",
    "test_streamed.py::test_planned_operator_roundtrip",
}


def pytest_collection_modifyitems(config, items):
    matched = set()
    for item in items:
        rel = item.nodeid.split("/")[-1]
        if rel in _SMOKE:
            matched.add(rel)
            item.add_marker(pytest.mark.smoke)
    # a renamed/moved/parameterized test must not silently drop out of
    # the smoke tier (r3 review finding) — fail collection loudly instead
    # (only when every smoke-listed FILE was collected, so running a
    # single-file subset still works)
    stale = _SMOKE - matched
    files = {i.nodeid.split("::")[0].split("/")[-1] for i in items}
    # fire on any collection that looks like the full suite (>= 10 test
    # files), so a RENAMED/DELETED smoke-listed file is caught too —
    # requiring every smoke file to be present would make exactly that
    # rename silent (r3 review follow-up)
    if stale and len(files) >= 10:
        raise pytest.UsageError(
            f"stale _SMOKE entries (no matching test collected): "
            f"{sorted(stale)}"
        )
