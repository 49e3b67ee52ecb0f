"""Perf probe: compare framing strategies + isolate chain stages on TPU.

Run: python scripts/perf_probe.py
"""
import sys, time
import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from kspecanal_tpu.config import SpecConfig, WINDOW_KAISER, window_lut, win_adj, cumu_weights

    rng = np.random.default_rng(0)
    for fft_size in (2048, 4096, 16384):
        cfg = SpecConfig(prg_mode="ZEROSPAN", fft_size=fft_size,
                         sampling_rate=2.4e6, window=WINDOW_KAISER,
                         cur_scan_non_overlap=0.5, x_res=512).finalize()
        T = max(1, 4_194_304 // cfg.full_size)  # ~4M samples per call
        re = jnp.asarray(rng.standard_normal((T, cfg.full_size)), jnp.float32)
        im = jnp.asarray(rng.standard_normal((T, cfg.full_size)), jnp.float32)
        n = cfg.fft_size
        starts = np.asarray(cfg.window_starts, np.int32)
        W = len(starts)
        win = jnp.asarray(window_lut(cfg.window, n), jnp.float32)
        adj = win_adj(cfg.window, n)
        wts = jnp.asarray(cumu_weights("AVG", W), jnp.float32)
        samples = T * cfg.full_size

        idx = jnp.asarray(starts[:, None] + np.arange(n, dtype=np.int32)[None, :])

        @jax.jit
        def frame_gather(re, im):
            fre = jnp.take(re, idx, axis=1) * win
            fim = jnp.take(im, idx, axis=1) * win
            return fre, fim

        hop = starts[1] - starts[0] if W > 1 else n
        k = n // hop if n % hop == 0 else None

        @jax.jit
        def frame_slices(re, im):
            # uniform hop, n % hop == 0: frames = concat of k shifted
            # reshapes; avoids gather entirely
            outs_re, outs_im = [], []
            rows = cfg.full_size // hop
            rre = re.reshape(T, rows, hop)
            rim = im.reshape(T, rows, hop)
            for j in range(k):
                outs_re.append(jax.lax.slice_in_dim(rre, j, j + W, axis=1) if False else rre[:, j:j + W, :])
                outs_im.append(rim[:, j:j + W, :])
            fre = jnp.concatenate(outs_re, axis=2) * win
            fim = jnp.concatenate(outs_im, axis=2) * win
            return fre, fim

        @jax.jit
        def chain_gather(re, im):
            fre, fim = frame_gather(re, im)
            spec = jnp.fft.fft(fre + 1j * fim, axis=-1)
            mags = (adj * 2.0 / n) * jnp.abs(spec)
            return jnp.fft.fftshift(jnp.einsum("w,twf->tf", wts, mags), axes=-1)

        @jax.jit
        def chain_slices(re, im):
            fre, fim = frame_slices(re, im)
            spec = jnp.fft.fft(fre + 1j * fim, axis=-1)
            mags = (adj * 2.0 / n) * jnp.abs(spec)
            return jnp.fft.fftshift(jnp.einsum("w,twf->tf", wts, mags), axes=-1)

        @jax.jit
        def fft_only(re, im):
            z = (re.reshape(T, -1, n) + 1j * im.reshape(T, -1, n))
            return jnp.abs(jnp.fft.fft(z, axis=-1))

        tg = timeit(chain_gather, re, im)
        ts = timeit(chain_slices, re, im)
        tf = timeit(fft_only, re, im)
        tfr = timeit(frame_gather, re, im)
        tfs = timeit(frame_slices, re, im)
        print(f"fft={fft_size:6d} T={T:4d} W={W:3d} "
              f"chain_gather={samples/tg/1e9:7.2f}G "
              f"chain_slices={samples/ts/1e9:7.2f}G "
              f"fft_only(no-ovl)={samples/tf/1e9:7.2f}G "
              f"frame_gather={samples/tfr/1e9:7.2f}G "
              f"frame_slices={samples/tfs/1e9:7.2f}G samp/s", flush=True)


if __name__ == "__main__":
    main()
