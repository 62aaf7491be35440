"""Free the single-client TPU tunnel (counterpart of the reference's
kill_gpu.py/kill_port.py ops scripts): finds python processes holding the
axon TPU claim and kills them. Never matches the agent/driver processes."""
import os
import re
import subprocess
import sys


def holders():
    out = subprocess.run(["ps", "-eo", "pid,args"], capture_output=True,
                         text=True).stdout
    pids = []
    for line in out.splitlines()[1:]:
        pid, _, args = line.strip().partition(" ")
        if re.match(r"python3? (-u )?(bench\.py|/tmp/|-c |-m actalker)", args.strip()):
            if int(pid) != os.getpid():
                pids.append(int(pid))
    return pids


if __name__ == "__main__":
    ps = holders()
    if not ps:
        print("no TPU-holding python processes found")
        sys.exit(0)
    for p in ps:
        print(f"killing {p}")
        try:
            os.kill(p, 9)
        except ProcessLookupError:
            pass
    print("done; wait ~30s before starting a new TPU process")
