"""NumPy reference implementations for iteration-parity testing.

BASELINE.md requires iteration counts within +-2 of the Rust reference at
rtol 1e-8. The Rust toolchain is not available in this environment, so
these NumPy implementations serve as the parity oracle: they implement the
*same algorithms with the same stopping rule* as the reference
(rel = ||r||/||r0|| <= tol, checked after each iteration —
src/utils/convergence.rs:16-35), in plain sequential double precision with
no reassociation. Tests then assert the JAX solvers match these histories
within the +-2 budget (tests/test_parity.py).

Each function returns (x, iterations, residual_history).
"""
from __future__ import annotations

import numpy as np


def _as_op(A):
    """Dense ndarray or scipy.sparse matrix -> f64 operator with @."""
    if hasattr(A, "tocsr") and not isinstance(A, np.ndarray):
        return A.tocsr().astype(np.float64)
    return np.asarray(A, dtype=np.float64)



def np_cg(A, b, x0=None, tol=1e-8, maxiter=1000):
    """Textbook CG (Saad §6.1), the reference CgSolver loop (cg.rs:141-285)."""
    A = _as_op(A)
    b = np.asarray(b, dtype=np.float64)
    x = np.zeros_like(b) if x0 is None else np.array(x0, dtype=np.float64)
    r = b - A @ x
    p = r.copy()
    rr = r @ r
    res0 = np.sqrt(rr)
    hist = [res0]
    if res0 == 0:
        return x, 0, hist
    for i in range(maxiter):
        ap = A @ p
        pap = p @ ap
        if pap <= 0:
            return x, i, hist  # IndefiniteMatrix (cg.rs:168-174)
        alpha = rr / pap
        x = x + alpha * p
        r = r - alpha * ap
        rr_new = r @ r
        res = np.sqrt(rr_new)
        hist.append(res)
        if res / res0 <= tol:
            return x, i + 1, hist
        beta = rr_new / rr
        rr = rr_new
        p = r + beta * p
    return x, maxiter, hist


def np_pcg(A, b, Minv, x0=None, tol=1e-8, maxiter=1000):
    """Preconditioned CG (Saad §9.2; pcg.rs:114-222). ``Minv``: callable r -> z."""
    A = _as_op(A)
    b = np.asarray(b, dtype=np.float64)
    x = np.zeros_like(b) if x0 is None else np.array(x0, dtype=np.float64)
    r = b - A @ x
    z = Minv(r)
    p = z.copy()
    rz = r @ z
    res0 = np.linalg.norm(r)
    hist = [res0]
    if res0 == 0:
        return x, 0, hist
    for i in range(maxiter):
        ap = A @ p
        pap = p @ ap
        if pap <= 0:
            return x, i, hist
        alpha = rz / pap
        x = x + alpha * p
        r = r - alpha * ap
        z = Minv(r)
        rz_new = r @ z
        res = np.linalg.norm(r)
        hist.append(res)
        if res / res0 <= tol:
            return x, i + 1, hist
        beta = rz_new / rz
        if beta < 0:
            return x, i + 1, hist  # IndefinitePreconditioner (pcg.rs:206-213)
        rz = rz_new
        p = z + beta * p
    return x, maxiter, hist


def np_gmres(A, b, x0=None, tol=1e-8, maxiter=1000, restart=30, Minv=None, side="left"):
    """Restarted GMRES with MGS + unconditional second orthogonalization
    pass and Givens rotations — the reference GmresSolver structure
    (gmres.rs:216-402)."""
    A = _as_op(A)
    b = np.asarray(b, dtype=np.float64)
    n = len(b)
    x = np.zeros_like(b) if x0 is None else np.array(x0, dtype=np.float64)
    Minv = Minv or (lambda v: v)

    def residual(x):
        r = b - A @ x
        return Minv(r) if side == "left" else r

    def op(v):
        if side == "left":
            return Minv(A @ v)
        if side == "right":
            return A @ Minv(v)
        return A @ v

    r = residual(x)
    res0 = np.linalg.norm(r)
    hist = [res0]
    if res0 == 0:
        return x, 0, hist
    it_total = 0
    while it_total < maxiter:
        r = residual(x)
        beta = np.linalg.norm(r)
        if beta / res0 <= tol:
            return x, it_total, hist
        m = restart
        V = np.zeros((m + 1, n))
        H = np.zeros((m + 1, m))
        cs, sn = np.zeros(m), np.zeros(m)
        g = np.zeros(m + 1)
        g[0] = beta
        V[0] = r / beta
        j_end = 0
        for j in range(m):
            if it_total + j >= maxiter:
                break
            w = op(V[j])
            # MGS + unconditional second pass (gmres.rs:83-96)
            for _ in range(2):
                for i in range(j + 1):
                    hij = V[i] @ w
                    H[i, j] += hij
                    w = w - hij * V[i]
            hnorm = np.linalg.norm(w)
            H[j + 1, j] = hnorm
            happy = hnorm < 1e-14  # gmres.rs:98-100
            if not happy:
                V[j + 1] = w / hnorm
            # Givens
            col = H[: j + 2, j].copy()
            for i in range(j):
                t = cs[i] * col[i] + sn[i] * col[i + 1]
                col[i + 1] = -sn[i] * col[i] + cs[i] * col[i + 1]
                col[i] = t
            denom = np.hypot(col[j], col[j + 1])
            cs[j] = col[j] / denom if denom else 1.0
            sn[j] = col[j + 1] / denom if denom else 0.0
            col[j] = denom
            col[j + 1] = 0.0
            H[: j + 2, j] = col
            g[j + 1] = -sn[j] * g[j]
            g[j] = cs[j] * g[j]
            j_end = j + 1
            hist.append(abs(g[j + 1]))
            if abs(g[j + 1]) / res0 <= tol or happy:
                break
        y = np.linalg.solve(
            np.triu(H[:j_end, :j_end]) + np.eye(j_end) * 0.0, g[:j_end]
        ) if j_end else np.zeros(0)
        update = y @ V[:j_end]
        if side == "right":
            update = Minv(update)
        x = x + update
        it_total += j_end
        r_meas = residual(x)
        if np.linalg.norm(r_meas) / res0 <= tol or j_end == 0:
            return x, it_total, hist
    return x, it_total, hist


def np_bicgstab(A, b, x0=None, tol=1e-8, maxiter=1000):
    """BiCGStab (Saad §7.1; bicgstab.rs)."""
    A = _as_op(A)
    b = np.asarray(b, dtype=np.float64)
    x = np.zeros_like(b) if x0 is None else np.array(x0, dtype=np.float64)
    r = b - A @ x
    rhat = r.copy()
    res0 = np.linalg.norm(r)
    hist = [res0]
    if res0 == 0:
        return x, 0, hist
    rho = alpha = omega = 1.0
    p = np.zeros_like(b)
    v = np.zeros_like(b)
    for i in range(maxiter):
        rho_new = rhat @ r
        if abs(rho_new) < 1e-30:
            return x, i, hist
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        v = A @ p
        sigma = rhat @ v
        if abs(sigma) < 1e-30:
            return x, i, hist
        alpha = rho_new / sigma
        s = r - alpha * v
        snorm = np.linalg.norm(s)
        if snorm / res0 <= tol:
            x = x + alpha * p
            hist.append(snorm)
            return x, i + 1, hist
        t = A @ s
        tt = t @ t
        omega = (t @ s) / tt if tt else 0.0
        if abs(omega) < 1e-30:
            return x, i, hist
        x = x + alpha * p + omega * s
        r = s - omega * t
        rho = rho_new
        res = np.linalg.norm(r)
        hist.append(res)
        if res / res0 <= tol:
            return x, i + 1, hist
    return x, maxiter, hist


def np_cgs(A, b, x0=None, tol=1e-8, maxiter=1000):
    """CGS (Saad §7.2; cgs.rs u/p/q recurrences)."""
    A = _as_op(A)
    b = np.asarray(b, dtype=np.float64)
    x = np.zeros_like(b) if x0 is None else np.array(x0, dtype=np.float64)
    r = b - A @ x
    rhat = r.copy()
    res0 = np.linalg.norm(r)
    hist = [res0]
    if res0 == 0:
        return x, 0, hist
    rho = rhat @ r
    u = r.copy()
    p = r.copy()
    for i in range(maxiter):
        v = A @ p
        sigma = rhat @ v
        if abs(sigma) < 1e-30:
            return x, i, hist
        alpha = rho / sigma
        q = u - alpha * v
        uq = u + q
        x = x + alpha * uq
        r = r - alpha * (A @ uq)
        res = np.linalg.norm(r)
        hist.append(res)
        if res / res0 <= tol:
            return x, i + 1, hist
        rho_new = rhat @ r
        if abs(rho_new) < 1e-30:
            return x, i + 1, hist
        beta = rho_new / rho
        rho = rho_new
        u = r + beta * q
        p = u + beta * (q + beta * p)
    return x, maxiter, hist


def np_cgnr(A, b, x0=None, tol=1e-8, maxiter=1000):
    """CG on the normal equations A^T A x = A^T b, converging on ||A^T r||."""
    A = _as_op(A)
    b = np.asarray(b, dtype=np.float64)
    x = np.zeros(A.shape[1]) if x0 is None else np.array(x0, dtype=np.float64)
    r = b - A @ x
    z = A.T @ r
    p = z.copy()
    zz = z @ z
    res0 = np.sqrt(zz)
    hist = [res0]
    if res0 == 0:
        return x, 0, hist
    for i in range(maxiter):
        w = A @ p
        ww = w @ w
        if ww == 0:
            return x, i, hist
        alpha = zz / ww
        x = x + alpha * p
        r = r - alpha * w
        z = A.T @ r
        zz_new = z @ z
        res = np.sqrt(zz_new)
        hist.append(res)
        if res / res0 <= tol:
            return x, i + 1, hist
        beta = zz_new / zz
        zz = zz_new
        p = z + beta * p
    return x, maxiter, hist


def np_qmr(A, b, x0=None, tol=1e-8, maxiter=1000):
    """QMR (Templates formulation; qmr.rs), convergence on the true
    residual recomputed each iteration (qmr.rs:147-153)."""
    A = _as_op(A)
    b = np.asarray(b, dtype=np.float64)
    x = np.zeros_like(b) if x0 is None else np.array(x0, dtype=np.float64)
    r = b - A @ x
    res0 = np.linalg.norm(r)
    hist = [res0]
    if res0 == 0:
        return x, 0, hist
    v_tld = r.copy()
    w_tld = r.copy()
    rho = res0
    xi = res0
    gamma, eta, theta, eps = 1.0, -1.0, 0.0, 1.0
    p = np.zeros_like(b)
    q = np.zeros_like(b)
    d = np.zeros_like(b)
    for i in range(maxiter):
        if abs(rho) < 1e-30 or abs(xi) < 1e-30:
            return x, i, hist
        v = v_tld / rho
        w = w_tld / xi
        delta = w @ v
        if abs(delta) < 1e-30:
            return x, i, hist
        p = v - (xi * delta / eps) * p
        q = w - (rho * delta / eps) * q
        p_tld = A @ p
        eps = q @ p_tld
        if abs(eps) < 1e-30:
            return x, i, hist
        beta = eps / delta
        if abs(beta) < 1e-30:
            return x, i, hist
        v_tld = p_tld - beta * v
        rho_new = np.linalg.norm(v_tld)
        w_tld = A.T @ q - beta * w
        xi = np.linalg.norm(w_tld)
        theta_new = rho_new / (gamma * abs(beta))
        gamma_new = 1.0 / np.sqrt(1.0 + theta_new ** 2)
        if gamma_new == 0:
            return x, i, hist
        eta = -eta * rho * gamma_new ** 2 / (beta * gamma ** 2)
        tg2 = (theta * gamma_new) ** 2
        d = eta * p + tg2 * d
        x = x + d
        rho, gamma, theta = rho_new, gamma_new, theta_new
        res = np.linalg.norm(b - A @ x)
        hist.append(res)
        if res / res0 <= tol:
            return x, i + 1, hist
    return x, maxiter, hist


def np_tfqmr(A, b, x0=None, tol=1e-8, maxiter=1000):
    """TFQMR with the two-substep inner loop and dpest = sqrt(2k+m+2)*tau
    (tfqmr.rs:157-198,186)."""
    A = _as_op(A)
    b = np.asarray(b, dtype=np.float64)
    x = np.zeros_like(b) if x0 is None else np.array(x0, dtype=np.float64)
    r = b - A @ x
    rstar = r.copy()
    res0 = np.linalg.norm(r)
    hist = [res0]
    if res0 == 0:
        return x, 0, hist
    w = r.copy()
    y1 = r.copy()
    u1 = A @ y1
    v = u1.copy()
    d = np.zeros_like(b)
    tau = res0
    theta = eta = 0.0
    rho = rstar @ r
    for k in range(maxiter):
        sigma = rstar @ v
        if abs(sigma) < 1e-30:
            return x, k, hist
        alpha = rho / sigma
        y2 = y1 - alpha * v
        u2 = A @ y2
        done = False
        for m_idx, (ym, um) in enumerate(((y1, u1), (y2, u2)), start=1):
            w = w - alpha * um
            d = ym + (theta ** 2 * eta / alpha) * d
            theta = np.linalg.norm(w) / tau
            c = 1.0 / np.sqrt(1.0 + theta ** 2)
            tau = tau * theta * c
            eta = c * c * alpha
            x = x + eta * d
            dpest = np.sqrt(2.0 * k + m_idx + 2.0) * tau
            if dpest / res0 <= tol:
                done = True
                break
        hist.append(dpest)
        if done:
            return x, k + 1, hist
        rho_new = rstar @ w
        if abs(rho_new) < 1e-30:
            return x, k + 1, hist
        beta = rho_new / rho
        rho = rho_new
        y1 = w + beta * y2
        u1 = A @ y1
        v = u1 + beta * (u2 + beta * v)
    return x, maxiter, hist


def np_minres(A, b, x0=None, tol=1e-8, maxiter=1000):
    """MINRES (Paige-Saunders; minres.rs structure)."""
    A = _as_op(A)
    b = np.asarray(b, dtype=np.float64)
    x = np.zeros_like(b) if x0 is None else np.array(x0, dtype=np.float64)
    r = b - A @ x
    beta1 = np.linalg.norm(r)
    hist = [beta1]
    if beta1 == 0:
        return x, 0, hist
    v_y = r.copy()
    r1 = r.copy()
    r2 = r.copy()
    w = np.zeros_like(b)
    w2 = np.zeros_like(b)
    oldb, beta = 1.0, beta1
    dbar = epsln = 0.0
    phibar = beta1
    cs, sn = -1.0, 0.0
    for i in range(maxiter):
        v = v_y / beta
        y = A @ v
        if i >= 1:
            y = y - (beta / oldb) * r1
        alfa = v @ y
        y = y - (alfa / beta) * r2
        r1, r2 = r2, y
        oldb, beta = beta, np.linalg.norm(y)
        oldeps = epsln
        delta = cs * dbar + sn * alfa
        gbar = sn * dbar - cs * alfa
        epsln = sn * beta
        dbar = -cs * beta
        gamma = max(np.hypot(gbar, beta), 1e-300)
        cs, sn = gbar / gamma, beta / gamma
        phi = cs * phibar
        phibar = sn * phibar
        w1, w2 = w2, w
        w = (v - oldeps * w1 - delta * w2) / gamma
        x = x + phi * w
        v_y = y
        hist.append(abs(phibar))
        if abs(phibar) / beta1 <= tol:
            return x, i + 1, hist
    return x, maxiter, hist
