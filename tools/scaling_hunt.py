"""Clean-window hunter v2 for the 1M-doc 4v16 scaling pair.

Alternates arms; runs when the probe shows moderate (<8%) steal, since
per-phase steal attribution lets a partially-crushed run still yield a
clean phase sample. Stops when either (a) a whole-run clean pair
(<=2%) exists, or (b) every (arm, phase) has >=2 clean (<=2%) samples.
Summarize with: python /root/repo/tools/scaling_report.py /tmp/scaling_hunt.log
"""
import json, os, subprocess, sys, time
import multiprocessing as mp

REPO = "/root/repo"
LOG = "/tmp/scaling_hunt.log"
FLAG = "/tmp/scaling_hunt.running"
PROBE_GATE = 8.0
CLEAN_GATE = 2.0
DOCS = "1000000"
PHASES = ("analyze", "postings")


def ticks():
    with open("/proc/stat") as f:
        v = list(map(int, f.readline().split()[1:]))
    steal = v[7] if len(v) > 7 else 0
    return steal, v[0] + v[1] + v[2] + steal


def _burn(sec):
    t = time.time()
    while time.time() - t < sec:
        pass


def probe(nproc=4, sec=4):
    s0, b0 = ticks()
    ps = [mp.Process(target=_burn, args=(sec,)) for _ in range(nproc)]
    [p.start() for p in ps]
    [p.join() for p in ps]
    s1, b1 = ticks()
    return 100.0 * (s1 - s0) / max(b1 - b0, 1)


def others_running():
    pats = ("^raylet", "python -m pytest", "python (/root/repo/)?bench\\.py",
            "tools/check_correctness")
    for pat in pats:
        if subprocess.run(["pgrep", "-f", pat], capture_output=True).returncode == 0:
            return True
    return False


def run_arm(ncpu):
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_DOCS=DOCS,
               BENCH_SKIP_REGISTRY="1")
    import threading
    load_max = [0.0]
    stop = threading.Event()
    def _watch():
        while not stop.is_set():
            load_max[0] = max(load_max[0], os.getloadavg()[0])
            stop.wait(5)
    w = threading.Thread(target=_watch, daemon=True); w.start()
    s0, b0 = ticks()
    t0 = time.time()
    p = subprocess.run([sys.executable, f"{REPO}/bench.py"], env=env,
                       capture_output=True, text=True, cwd=REPO)
    wall = time.time() - t0
    stop.set(); w.join()
    s1, b1 = ticks()
    steal = round(100.0 * (s1 - s0) / max(b1 - b0, 1), 2)
    try:
        r = json.loads(p.stdout.strip().splitlines()[-1])
    except Exception:
        r = {"error": (p.stderr or "")[-500:]}
    r["arm_cpus"] = ncpu
    r["steal_busy_pct"] = steal
    r["load_max"] = round(load_max[0], 1)
    r["wall"] = round(wall, 1)
    r["ts"] = time.strftime("%H:%M:%S")
    with open(LOG, "a") as f:
        f.write(json.dumps(r) + "\n")
    if steal <= CLEAN_GATE and "error" not in r:
        import shutil
        try:
            shutil.copy(f"/tmp/searchengine_bench/idx-{ncpu}/manifest.json",
                        f"/tmp/clean_manifest_{ncpu}cpu.json")
        except OSError:
            pass
    return r


def rows():
    try:
        return [json.loads(l) for l in open(LOG) if l.strip()]
    except FileNotFoundError:
        return []


def done():
    rs = [r for r in rows() if "error" not in r]

    def clean_runs(n):
        # load_max guards against the agent's own concurrent work, which
        # /proc/stat steal cannot see (same-host load, not hypervisor)
        return [r for r in rs if r.get("arm_cpus") == n
                and r.get("steal_busy_pct", 99) <= CLEAN_GATE
                and r.get("load_max", 0) <= n + 3]

    if clean_runs(4) and clean_runs(16):
        return True
    for n in (4, 16):
        for ph in PHASES:
            k = sum(1 for r in rs if r.get("arm_cpus") == n
                    and r.get("phase_steal", {}).get(ph, 99) <= CLEAN_GATE
                    and r.get("load_max", 0) <= n + 3)
            if k < 2:
                return False
    return True


def next_arm():
    rs = [r for r in rows() if "error" not in r]
    n4 = sum(1 for r in rs if r.get("arm_cpus") == 4)
    n16 = sum(1 for r in rs if r.get("arm_cpus") == 16)
    # 4-cpu runs are ~3x longer; keep sample counts comparable
    return 16 if n16 < n4 else 4


def main():
    while not done():
        if others_running():
            time.sleep(90)
            continue
        if os.getloadavg()[0] > 1.5:  # agent's own heavy work in flight
            time.sleep(60)
            continue
        pct = probe()
        with open("/tmp/scaling_hunt.probe", "a") as f:
            f.write(f"{time.strftime('%H:%M:%S')} probe {pct:.2f}%\n")
        if pct > PROBE_GATE:
            time.sleep(150)
            continue
        open(FLAG, "w").write(str(os.getpid()))
        try:
            run_arm(next_arm())
        finally:
            if os.path.exists(FLAG):
                os.remove(FLAG)
    print("enough clean evidence collected")


if __name__ == "__main__":
    main()
