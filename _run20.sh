set -e
cd /root/repo
python benches/ceremony.py 1048576 > /tmp/ceremony20.log 2>&1
python bench.py 1048576 3 > /tmp/bench20.log 2>&1
