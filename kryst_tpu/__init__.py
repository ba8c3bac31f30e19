"""kryst_tpu — a TPU-native Krylov subspace solver framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the Rust
library tmathis720/kryst (see SURVEY.md): direct and iterative (Krylov)
solvers with preconditioning, on a functional, jit-first architecture:

- linear operators and preconditioners are pytrees (kryst_tpu.core.linop,
  kryst_tpu.pc) usable under ``jax.jit`` / ``shard_map``;
- solver iterations are ``lax.while_loop`` kernels that report numerical
  breakdown via flags in :class:`~kryst_tpu.core.convergence.SolveStats`;
- distribution is a `jax.sharding.Mesh` with psum reductions over ICI
  (kryst_tpu.parallel), replacing the reference's Rayon/MPI ``Comm`` layer.

The flat re-exports below mirror the reference's crate root (lib.rs:17-28).
"""

from kryst_tpu.core.convergence import (
    Breakdown,
    Convergence,
    NormType,
    SolveStats,
)
from kryst_tpu.core.linop import (
    DenseOperator,
    ELLOperator,
    FunctionOperator,
    StencilOperator2D,
    StencilOperator3D,
    as_operator,
)
from kryst_tpu.api import KSP, PCConfig, SolverKind, solve
from kryst_tpu.matrix.csr import CSRMatrix
from kryst_tpu.ops.dia import DIAOperator, csr_to_dia
from kryst_tpu.pc.amg import AMGPC
from kryst_tpu.pc.asm import AdditiveSchwarzPC
from kryst_tpu.pc.gmg import GMGPC
from kryst_tpu.pc.base import IdentityPC
from kryst_tpu.pc.block_jacobi import BlockJacobiPC
from kryst_tpu.pc.chebyshev import ChebyshevPC
from kryst_tpu.pc.deflation import DeflationPC
from kryst_tpu.pc.ilu import ILUPC, ilu0, ilup, ilut
from kryst_tpu.pc.jacobi import JacobiPC
from kryst_tpu.pc.sor import (
    MulticolorSORPC,
    SORPC,
    SweepType,
    gauss_seidel,
    ssor,
)
from kryst_tpu.pc.spai import SPAIPC, spai_setup
from kryst_tpu.solvers.bicgstab import bicgstab
from kryst_tpu.solvers.cg import cg, pcg
from kryst_tpu.solvers.cgnr import cgne, cgnr
from kryst_tpu.solvers.idr import idr
from kryst_tpu.solvers.lsqr import lsqr
from kryst_tpu.solvers.lobpcg import lobpcg
from kryst_tpu.solvers.cgs import cgs
from kryst_tpu.solvers.direct import (
    LUFactorization,
    QRFactorization,
    lu_factor,
    lu_solve,
    qr_factor,
    qr_solve,
)
from kryst_tpu.solvers.block_cg import block_pcg
from kryst_tpu.solvers.block_gmres import block_gmres
from kryst_tpu.solvers.ca_gmres import ca_gmres
from kryst_tpu.solvers.gmres import fgmres, gmres
from kryst_tpu.solvers.minres import minres
from kryst_tpu.solvers.pipelined import pipecg
from kryst_tpu.solvers.qmr import qmr
from kryst_tpu.solvers.refine import (
    RefineStats,
    iterative_refinement,
    refine_device,
)
from kryst_tpu.solvers.tfqmr import tfqmr

__version__ = "0.1.0"
