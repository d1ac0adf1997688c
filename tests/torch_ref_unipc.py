"""Independent torch reference of diffusers' ``UniPCMultistepScheduler``
(flow-matching variant: ``use_flow_sigmas``, ``predict_x0``, bh2).

Companion to the other ``torch_ref_*`` modules: written from the upstream
algorithm (stateful model_outputs/timestep_list/this_order bookkeeping,
multistep uni_p/uni_c bh updates) so ``tests/test_torch_reference.py`` can
diff the scan-compatible JAX implementation
(``scheduler/unipc.py:unipc_eval_step`` with its explicit carry and
host-precomputed order schedule) against a second, independently-stateful
implementation of the same math.

Conventions encoded: α_t = 1−σ_t, λ = log(α/σ); x0 = x − σ·v;
h = λ_t − λ_s0, hh = −h (predict_x0), h_φ1 = expm1(hh), B_h = h_φ1 (bh2);
predictor order-2 short-circuits to ρ = [0.5]; corrector solves the FULL
order system with the current point appended at r = 1 (order-1 corrector
uses ρ = [0.5] on D1_t); ``lower_order_final`` tapers the order near σ→0;
the corrector at step i runs at the order the predictor used at step i−1.
"""
from __future__ import annotations

import math

import numpy as np


class TorchUniPC:
    def __init__(self, sigmas, solver_order=2, lower_order_final=True):
        # sigmas: (T+1,) incl. terminal 0
        self.sigmas = [float(s) for s in sigmas]
        self.solver_order = solver_order
        self.lower_order_final = lower_order_final
        self.num_steps = len(self.sigmas) - 1
        self.model_outputs = [None] * solver_order
        self.timestep_list = [None] * solver_order
        self.lower_order_nums = 0
        self.last_sample = None
        self.this_order = None
        self.step_index = 0

    # λ from σ (clipped exactly like the JAX side)
    def _lam(self, sigma):
        sigma = min(max(sigma, 1e-6), 1.0 - 1e-6)
        return math.log((1.0 - sigma) / sigma)

    def _alpha_sigma(self, idx):
        s = self.sigmas[idx]
        return 1.0 - s, max(s, 1e-6)

    def _uni_p(self, sample, order):
        i = self.step_index
        lam_t = self._lam(self.sigmas[i + 1])
        lam_s0 = self._lam(self.sigmas[i])
        alpha_t, sigma_t = self._alpha_sigma(i + 1)
        _, sigma_s0 = self._alpha_sigma(i)
        m0 = self.model_outputs[-1]
        h = lam_t - lam_s0
        hh = -h
        h_phi_1 = math.expm1(hh)
        B_h = h_phi_1  # bh2
        rks, D1s = [], []
        for k in range(1, order):
            lam_sk = self._lam(self.sigmas[i - k])
            rk = (lam_sk - lam_s0) / h
            mk = self.model_outputs[-(k + 1)]
            rks.append(rk)
            D1s.append((mk - m0) / rk)
        x_t_ = (sigma_t / sigma_s0) * sample - alpha_t * h_phi_1 * m0
        if order == 1:
            return x_t_
        if order == 2:
            rhos = [0.5]  # diffusers' special case
        else:
            # R rows rks^k (k = 0..order-2), b from the φ recurrence
            rks_v = np.asarray(rks + [1.0])
            R, b = self._Rb(rks_v, hh, B_h)
            rhos = np.linalg.solve(R[:-1, :-1], b[:-1])
        res = sum(float(r) * d for r, d in zip(rhos, D1s))
        return x_t_ - alpha_t * B_h * res

    def _uni_c(self, this_model_output, last_sample, this_sample, order):
        i = self.step_index
        lam_t = self._lam(self.sigmas[i])
        lam_s0 = self._lam(self.sigmas[i - 1])
        alpha_t, sigma_t = self._alpha_sigma(i)
        _, sigma_s0 = self._alpha_sigma(i - 1)
        m0 = self.model_outputs[-1]  # prediction AT s0 (previous point)
        h = lam_t - lam_s0
        hh = -h
        h_phi_1 = math.expm1(hh)
        B_h = h_phi_1
        rks, D1s = [], []
        for k in range(1, order):
            lam_sk = self._lam(self.sigmas[i - 1 - k])
            rk = (lam_sk - lam_s0) / h
            mk = self.model_outputs[-(k + 1)]
            rks.append(rk)
            D1s.append((mk - m0) / rk)
        rks_v = np.asarray(rks + [1.0])
        x_t_ = (sigma_t / sigma_s0) * last_sample - alpha_t * h_phi_1 * m0
        D1_t = this_model_output - m0
        if order == 1:
            rhos = np.asarray([0.5])
        else:
            R, b = self._Rb(rks_v, hh, B_h)
            rhos = np.linalg.solve(R, b)
        res = sum(float(r) * d for r, d in zip(rhos[:-1], D1s)) if order > 1 else 0.0
        return x_t_ - alpha_t * B_h * (res + float(rhos[-1]) * D1_t)

    @staticmethod
    def _Rb(rks_v, hh, B_h):
        n = len(rks_v)
        R = np.stack([rks_v ** k for k in range(n)])
        b = []
        h_phi_k = math.expm1(hh) / hh - 1.0
        fac = 1.0
        for k in range(1, n + 1):
            b.append(h_phi_k * fac / B_h)
            fac *= k + 1
            h_phi_k = h_phi_k / hh - 1.0 / math.factorial(k + 1)
        return R, np.asarray(b)

    def step(self, model_output, sample):
        """model_output: velocity v at (sample, σ_i); returns next sample."""
        i = self.step_index
        m_conv = sample - self.sigmas[i] * model_output  # x0 prediction
        use_corrector = i > 0 and self.last_sample is not None
        if use_corrector:
            sample = self._uni_c(m_conv, self.last_sample, sample, self.this_order)
        # shift history
        for k in range(self.solver_order - 1):
            self.model_outputs[k] = self.model_outputs[k + 1]
            self.timestep_list[k] = self.timestep_list[k + 1]
        self.model_outputs[-1] = m_conv
        self.timestep_list[-1] = i
        order = min(self.solver_order, self.num_steps - i) if self.lower_order_final \
            else self.solver_order
        self.this_order = max(1, min(order, self.lower_order_nums + 1))
        self.last_sample = sample
        prev = self._uni_p(sample, self.this_order)
        if self.lower_order_nums < self.solver_order:
            self.lower_order_nums += 1
        self.step_index += 1
        return prev
