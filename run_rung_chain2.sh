#!/bin/bash
cd /root/repo
echo "chain2 start $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)" > rung_chain2.status
python refreeze_rung.py > refreeze_rung_sf10b.out 2> refreeze_rung_sf10b.err
echo "refreeze_rc=$? $(date +%H:%M:%S)" >> rung_chain2.status
python store2m_rung.py > store2m_rung4.out 2> store2m_rung4.err
echo "store2m_rc=$? $(date +%H:%M:%S)" >> rung_chain2.status
echo "chain2 done $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)" >> rung_chain2.status
