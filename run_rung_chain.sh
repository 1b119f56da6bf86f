#!/bin/bash
# r12 rung chain — strictly serial, nothing else heavy may run alongside.
cd /root/repo
echo "chain start $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)" > rung_chain.status
python store2m_rung.py > store2m_rung3.out 2> store2m_rung3.err
echo "store2m_rc=$? $(date +%H:%M:%S)" >> rung_chain.status
python refreeze_rung.py > refreeze_rung_sf10.out 2> refreeze_rung_sf10.err
echo "refreeze_rc=$? $(date +%H:%M:%S)" >> rung_chain.status
python ann_store_rung.py > ann_store_sf10.out 2> ann_store_sf10.err
echo "ann_rc=$? $(date +%H:%M:%S)" >> rung_chain.status
python stream_trigger_rung.py > stream_trigger_sf10.out 2> stream_trigger_sf10.err
echo "stream_rc=$? $(date +%H:%M:%S)" >> rung_chain.status
echo "chain done $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)" >> rung_chain.status
