"""Report CPU-steal%% over an interval — the measurement-hygiene probe
for this host (Firecracker guest with bursty neighbor steal; r12).
Usage: python tools/steal_probe.py [seconds]"""
import sys, time

def snap():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return sum(v), v[7]

def main():
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    t0, s0 = snap(); time.sleep(dur); t1, s1 = snap()
    tot, st = t1 - t0, s1 - s0
    print(f"steal_pct={100.0*st/tot:.2f} over {dur:.0f}s")
    return 0

if __name__ == "__main__":
    raise SystemExit(main())
