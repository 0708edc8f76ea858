// Native v2 log->MIDI->piano-roll decoder.
//
// Consumes the DES engine's raw event records (values/ids/servers/kinds, as
// produced by native/des_engine.cpp) directly — no string formatting, no
// regex — and reproduces, bit-for-bit, what the Python chain
//   music/generators.py::process_adjsim_log_v2 (MidiGeneratorV2 +
//   finalize_in_memory) -> music/piano_roll.py::generate_piano_roll
// computes for the in-memory (no file artifacts) path. Reference semantics
// it must preserve exactly (citations into /root/reference/):
//
// * regex match/no-match (MMGAN_MIDI_DES/sim_log_to_midi.py:228-237): a
//   record "matches" iff kind is arrival|departure, server >= 0, and the
//   time's repr() is a plain non-negative decimal — i.e. NOT negative, NOT
//   scientific notation. CPython repr(float) switches to scientific when
//   the value is nonzero and < 1e-4 or >= 1e16; such lines silently never
//   match (a reference quirk: tiny early event times are skipped).
// * MidiGeneratorV2.process_line (sim_log_to_midi.py:99-180): python int()
//   truncation, python % (non-negative results), the midi_time<200 /
//   len(track)<500 gate, the previous_time monotonic clamp, program_change
//   only on instrument switches.
// * save_midi cleanup (sim_log_to_midi.py:182-220): the mutate-while-
//   iterating first-equal removal pass, then end_of_track append, then
//   clean_midi_file (stuck-note dedup + long-delta removal with reverse
//   pops) — all replicated with python-list iteration semantics.
// * generate_piano_roll (MMGAN_MIDI_DES/datasets.py:13-70): mido merge
//   semantics make each message's stored absolute time act as a DELTA in
//   ticks; tick2second uses the tempo in effect BEFORE the tempo message
//   is applied; int(round()) is banker's rounding (nearbyint under
//   FE_TONEAREST); a note_on whose step lands outside the roll raises
//   IndexError and ABORTS the whole message loop (partial roll kept);
//   note_off duration spans are numpy slice-assignments (silently clipped).
//
// Float discipline: time deltas are (double)(ticks*tempo) * 1e-6 / 480.0
// accumulated in order; compile with -ffp-contract=off (FMA contraction
// would change low bits vs CPython's unfused math).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cfenv>
#include <vector>
#include <map>
#include <algorithm>

namespace {

typedef int64_t i64;

inline i64 pymod(i64 a, i64 m) {
  i64 r = a % m;
  return (r < 0) ? r + m : r;
}

inline i64 fold_queue_length(i64 q) {
  // music/generators.py::_fold_queue_length (sim_log_process_music.py:94-97)
  if (q >= 127 && q < 2 * 127) return std::min<i64>(127, std::max<i64>(0, 2 * 127 - q));
  if (q >= 2 * 127) return std::min<i64>(127, std::max<i64>(0, pymod(q, 127)));
  return q;
}

// CPython repr(float) uses scientific notation iff the (finite, nonzero)
// value is < 1e-4 or >= 1e16 in magnitude; the music regex then fails.
inline bool repr_matches_decimal(double v) {
  if (!std::isfinite(v)) return false;
  if (v < 0.0) return false;      // leading '-' never matches
  if (v == 0.0) return true;      // '0.0'
  return v >= 1e-4 && v < 1e16;
}

enum MsgType : uint8_t {
  NOTE_ON = 0, NOTE_OFF = 1, PROGRAM = 2,
  META_TEMPO = 3, META_TIMESIG = 4, META_KEYSIG = 5, META_EOT = 6,
};

struct Msg {
  uint8_t type;
  int32_t note;      // 0 unless note_on/off
  int32_t velocity;  // 0 unless note_on/off
  int32_t program;   // 0 unless program_change
  i64 time;
};

inline bool msg_eq(const Msg &a, const Msg &b) {
  // Python value equality over (type, fields incl. time). Meta fields other
  // than time are constants within one generator instance, so type+time
  // suffices for metas; channel is always 0.
  return a.type == b.type && a.time == b.time && a.note == b.note &&
         a.velocity == b.velocity && a.program == b.program;
}

}  // namespace

namespace {

inline void put_varlen(std::vector<uint8_t> &out, i64 value) {
  // music/midi.py::_encode_varlen with the save-path max(0, int(time)) clamp
  if (value < 0) value = 0;
  uint8_t buf[10];
  int n = 0;
  buf[n++] = value & 0x7F;
  value >>= 7;
  while (value) {
    buf[n++] = (value & 0x7F) | 0x80;
    value >>= 7;
  }
  for (int i = n - 1; i >= 0; i--) out.push_back(buf[i]);
}

}  // namespace

// v1/v0 decoder (GAN-DES / standalone-simulator MidiGenerator,
// GAN_DES/sim_log_process_music.py:10-143 and
// SIMULATOR/simulation_to_wav.py:107-226): arrivals stage note params,
// departures emit note_on+note_off pairs (v0 additionally program_change
// around each); no time gates, no cleanup passes. Emits BOTH the encoded
// SMF bytes (byte-identical to MidiFile.save of the Python generator's
// track — the output.mid artifact) and the synth event arrays
// (music/synth.py::midi_to_event_arrays semantics: absolute seconds under
// the default 500000/480 tempo map, float32-cast at the boundary).
extern "C" int midi_decode_v1(
    const double *rec_values, const i64 *rec_ids, const int32_t *rec_servers,
    const uint8_t *rec_kinds, i64 n_records, i64 n_preamble,
    const i64 *instruments, const i64 *note_levels, int32_t n_nodes,
    int32_t program_change_per_note, int32_t max_events,
    uint8_t *smf_out, i64 smf_cap, i64 *smf_len,
    int32_t *ev_notes, float *ev_vels, float *ev_ons, float *ev_offs,
    int32_t *ev_progs, i64 *ev_n, double *ev_end) {
  if (n_nodes <= 0) return 1;

  struct Msg {
    uint8_t type;  // 0 note_on, 1 note_off, 2 program
    int32_t note, velocity, program;
    i64 time;
  };
  std::vector<Msg> track;
  track.reserve(1024);

  std::vector<i64> queue_lengths(n_nodes, 0);
  std::vector<uint8_t> queue_seen(n_nodes, 0);
  struct FE { i64 time, velocity, service; };
  std::vector<FE> fe(n_nodes);
  std::vector<uint8_t> fe_valid(n_nodes, 0);

  i64 budget = 5000 - n_preamble;
  if (budget < 0) budget = 0;
  const i64 n = std::min<i64>(n_records, budget);

  for (i64 r = 0; r < n; r++) {
    const uint8_t kind = rec_kinds[r];
    if (kind != 0 && kind != 2) continue;
    const int32_t s = rec_servers[r];
    if (s < 0 || s >= n_nodes) continue;
    const double v = rec_values[r];
    if (!repr_matches_decimal(v)) continue;
    const i64 id = rec_ids[r];
    if (id < 0) continue;
    // fixed skip moduli 3/5/7 (sim_log_process_music.py:120,137)
    if (!(id % 3 == 0 || id % 5 == 0 || id % 7 == 0)) continue;

    i64 midi_time = (i64)v;
    if (midi_time < 0) midi_time = 0;

    if (kind == 0) {  // arrival: stage only (:120-135)
      queue_lengths[s] += 1;
      queue_seen[s] = 1;
      const i64 ql = fold_queue_length(queue_lengths[s]);
      const i64 max_ci = std::max<i64>(1, pymod(30 + ql, 127));
      i64 ci = id;
      if (ci >= max_ci && ci < 2 * max_ci) {
        ci = std::min(max_ci, std::max<i64>(0, 2 * max_ci - ci));
      } else if (ci >= 2 * max_ci) {
        ci = std::min(max_ci, std::max<i64>(0, pymod(ci, max_ci)));
      }
      fe[s] = {midi_time, 60 + pymod(ci, 67), ql};
      fe_valid[s] = 1;
    } else {  // departure: emit the pair (:137-155)
      if (fe_valid[s]) {
        const i64 on_time = std::max<i64>(0, fe[s].time);
        const i64 off_time = std::max<i64>(
            0, fe[s].time + (midi_time - fe[s].time) + std::max<i64>(0, fe[s].service));
        const int32_t note = (int32_t)note_levels[s];
        const int32_t vel = (int32_t)fe[s].velocity;
        if (program_change_per_note)
          track.push_back({2, 0, 0, (int32_t)instruments[s], on_time});
        track.push_back({0, note, vel, 0, on_time});
        if (program_change_per_note)
          track.push_back({2, 0, 0, (int32_t)instruments[s], off_time});
        track.push_back({1, note, vel, 0, off_time});
      }
      if (queue_seen[s]) {
        queue_lengths[s] -= 1;
      } else {
        queue_lengths[s] = 0;
        queue_seen[s] = 1;
      }
    }
  }

  // ---- SMF encode (MidiFile.save: type 1, 1 track, tpb 480) --------------
  std::vector<uint8_t> body;
  body.reserve(track.size() * 8 + 8);
  for (const Msg &m : track) {
    put_varlen(body, m.time);
    if (m.type == 2) {
      body.push_back(0xC0);
      body.push_back((uint8_t)(m.program & 0x7F));
    } else {
      body.push_back(m.type == 0 ? 0x90 : 0x80);
      body.push_back((uint8_t)(m.note & 0x7F));
      body.push_back((uint8_t)(m.velocity & 0x7F));
    }
  }
  // trailing end_of_track appended by save_midi (time 0)
  put_varlen(body, 0);
  body.push_back(0xFF);
  body.push_back(0x2F);
  body.push_back(0x00);

  const i64 total = 14 + 8 + (i64)body.size();
  if (total > smf_cap) return 2;
  uint8_t *p = smf_out;
  auto be32 = [&](uint32_t x) { *p++ = x >> 24; *p++ = x >> 16; *p++ = x >> 8; *p++ = x; };
  auto be16 = [&](uint16_t x) { *p++ = x >> 8; *p++ = x; };
  std::memcpy(p, "MThd", 4); p += 4;
  be32(6); be16(1); be16(1); be16(480);
  std::memcpy(p, "MTrk", 4); p += 4;
  be32((uint32_t)body.size());
  std::memcpy(p, body.data(), body.size());
  *smf_len = total;

  // ---- event arrays (midi_to_event_arrays over the same stream) ----------
  // tempo map: no set_tempo in the track -> constant default 500000/480;
  // each stored time acts as a delta tick (merge quirk)
  double t = 0.0;
  i64 cnt = 0;
  double end_max = 0.0;
  // open_ev keyed by note: v1 pairs are adjacent so a stack depth of 1 per
  // note suffices; mirror the dict semantics anyway
  i64 open_idx[128];
  for (int i = 0; i < 128; i++) open_idx[i] = -1;
  std::vector<double> offs_all;  // doubles; float32 cast at the boundary
  offs_all.reserve(512);
  std::vector<double> ons_all;
  ons_all.reserve(512);
  int32_t program = 0;
  for (const Msg &m : track) {
    t += (double)(m.time * (i64)500000) * 1e-6 / 480.0;
    if (m.type == 2) {
      program = m.program;
    } else if (m.type == 0 && m.velocity > 0) {
      if (cnt < (i64)max_events) {
        ev_notes[cnt] = m.note;
        ev_vels[cnt] = (float)m.velocity;
        ev_ons[cnt] = (float)t;
        ev_offs[cnt] = (float)(t + 0.25);  // until matched (held default)
        ev_progs[cnt] = program;
      }
      open_idx[m.note & 127] = cnt;
      ons_all.push_back(t);
      offs_all.push_back(t + 0.25);
      cnt++;
    } else if (m.type == 1 || m.type == 0) {
      const i64 oi = open_idx[m.note & 127];
      if (oi >= 0) {
        if (oi < (i64)max_events) ev_offs[oi] = (float)t;
        offs_all[oi] = t;
        open_idx[m.note & 127] = -1;
      }
    }
  }
  for (double o : offs_all) end_max = std::max(end_max, o);
  *ev_n = cnt;
  *ev_end = end_max;
  return 0;
}

extern "C" int midi_decode_v2(
    const double *rec_values, const i64 *rec_ids, const int32_t *rec_servers,
    const uint8_t *rec_kinds, i64 n_records, i64 n_preamble,
    const i64 *instruments, const i64 *note_levels, int32_t n_nodes,
    i64 skip1, i64 skip2, i64 skip3, i64 base, i64 tempo_param, i64 var,
    int32_t start, int32_t end, int32_t sequence_length,
    double *roll, double *durations) {
  (void)start;  // crop applied by the python wrapper (pitch-axis quirk)
  const int32_t W = end - start;
  if (W <= 0 || n_nodes <= 0) return 1;

  // ---- MidiGeneratorV2 state (preamble: sim_log_to_midi.py:49-70) -------
  std::vector<Msg> track;
  track.reserve(600);
  track.push_back({META_TEMPO, 0, 0, 0, 0});
  track.push_back({META_TIMESIG, 0, 0, 0, 0});
  track.push_back({META_KEYSIG, 0, 0, 0, 0});
  track.push_back({PROGRAM, 0, 0, 0, 0});

  std::vector<i64> queue_lengths(n_nodes, 0);
  std::vector<uint8_t> queue_seen(n_nodes, 0);
  struct FE { i64 time, velocity, service; };
  std::vector<FE> fe(n_nodes);
  std::vector<uint8_t> fe_valid(n_nodes, 0);
  i64 previous_time = 0;
  i64 current_instrument = 0;

  // ---- line loop (process_adjsim_log_v2: count <= 5000 incl. preamble) --
  i64 budget = 5000 - n_preamble;
  if (budget < 0) budget = 0;
  i64 n = std::min<i64>(n_records, budget);

  for (i64 r = 0; r < n; r++) {
    const uint8_t kind = rec_kinds[r];        // 0 arrival, 1 processing,
    if (kind != 0 && kind != 2) continue;     // 2 departure, 3 delayed
    const int32_t s = rec_servers[r];
    if (s < 0 || s >= n_nodes) continue;      // 'None' server never matches
    const double v = rec_values[r];
    if (!repr_matches_decimal(v)) continue;
    const i64 id = rec_ids[r];
    if (id < 0) continue;                     // '-' in group 2 never matches

    i64 midi_time = (i64)v;                   // int(float(str)) truncation
    if (midi_time < 0) midi_time = 0;         // max(0, ...) (:100)
    if (!(midi_time < 200 && (i64)track.size() < 500)) continue;
    if (previous_time > midi_time) midi_time = previous_time;  // clamp

    const bool skip = (pymod(id, skip1) == 0) || (pymod(id, skip2) == 0) ||
                      (pymod(id, skip3) == 0);
    if (!skip) continue;

    if (kind == 0) {  // arrival -> stage + note_on (:224-253)
      queue_lengths[s] += 1;
      queue_seen[s] = 1;
      const i64 ql = fold_queue_length(queue_lengths[s]);

      const i64 max_ci = base + var;
      i64 ci = base - var + id;
      if (ci > max_ci) ci = max_ci - pymod(ci, max_ci);

      fe[s] = {midi_time, pymod(ci, 126), ql};
      fe_valid[s] = 1;

      i64 on_time = std::max(previous_time, fe[s].time);
      previous_time = on_time;

      if (current_instrument != instruments[s]) {
        current_instrument = instruments[s];
        track.push_back({PROGRAM, 0, 0, (int32_t)instruments[s], on_time});
      }
      track.push_back({NOTE_ON, (int32_t)note_levels[s],
                       (int32_t)fe[s].velocity, 0, on_time});
    } else {  // departure -> note_off (:255-277)
      if (fe_valid[s]) {
        i64 off_time = std::max(
            previous_time,
            fe[s].time + (midi_time - fe[s].time) + std::max<i64>(0, fe[s].service));
        previous_time = off_time;
        if (current_instrument != instruments[s]) {
          current_instrument = instruments[s];
          track.push_back({PROGRAM, 0, 0, (int32_t)instruments[s], off_time});
        }
        track.push_back({NOTE_OFF, (int32_t)note_levels[s],
                         (int32_t)fe[s].velocity, 0, off_time});
      }
      if (queue_seen[s]) {
        queue_lengths[s] -= 1;
      } else {
        queue_lengths[s] = 0;
        queue_seen[s] = 1;
      }
    }
  }

  // ---- finalize_in_memory (sim_log_to_midi.py:182-220) ------------------
  // pass 1: `for msg in track: if msg.time > 200: track.remove(msg)` —
  // python list-iterator semantics (yield track[k], k += 1, removal of the
  // FIRST equal element shifts the list without adjusting k)
  {
    size_t k = 0;
    while (k < track.size()) {
      Msg m = track[k];
      k++;
      if (m.time > 200) {
        for (size_t j = 0; j < track.size(); j++) {
          if (msg_eq(track[j], m)) {
            track.erase(track.begin() + j);
            break;
          }
        }
      }
    }
  }
  track.push_back({META_EOT, 0, 0, 0, 0});
  // clean_midi_file (:203-220)
  {
    std::map<int32_t, i64> note_on_times;
    std::vector<size_t> to_remove;
    for (size_t j = 0; j < track.size(); j++) {
      const Msg &m = track[j];
      bool marked = false;
      if (m.type == NOTE_ON) {
        auto it = note_on_times.find(m.note);
        if (it != note_on_times.end() && it->second > 0) {
          to_remove.push_back(j);
          marked = true;
        } else {
          note_on_times[m.note] = m.time;
        }
      } else if (m.type == NOTE_OFF) {
        auto it = note_on_times.find(m.note);
        if (it == note_on_times.end() || it->second == 0) {
          to_remove.push_back(j);
          marked = true;
        } else {
          it->second = 0;
        }
      }
      if (m.time > 200 && !marked) {
        // `j not in msgs_to_remove` — j can only already be present from
        // the note branch above in this same iteration
        to_remove.push_back(j);
      }
    }
    std::sort(to_remove.rbegin(), to_remove.rend());
    for (size_t idx : to_remove) track.erase(track.begin() + idx);
  }

  // ---- generate_piano_roll (datasets.py:13-70 semantics) -----------------
  // merge_tracks on a single track whose times are non-decreasing reduces
  // to: delta_ticks(msg) == msg.time (the re-appended end_of_track gets 0).
  std::memset(roll, 0, sizeof(double) * 128 * W);
  std::memset(durations, 0, sizeof(double) * 128 * W);

  const int prev_round = std::fegetround();
  std::fesetround(FE_TONEAREST);  // python round() == round-half-even

  double my_time = 0.0;
  double note_on_time[128] = {0.0};
  i64 tempo = 500000;  // mido default until the tempo meta is *applied*
  for (const Msg &m : track) {
    double delta = 0.0;
    if (m.time > 0) {
      delta = (double)(m.time * tempo) * 1e-6 / 480.0;  // tick2second
    }
    my_time += delta;
    i64 step = (i64)std::nearbyint(my_time);
    if (step >= (i64)sequence_length) break;
    if (m.type == NOTE_ON) {
      if (step >= (i64)W || step < 0) break;  // IndexError aborts the loop
      roll[(size_t)m.note * W + step] = (double)m.velocity;
      note_on_time[m.note] = (double)step;
    } else if (m.type == NOTE_OFF) {
      i64 off = (i64)std::nearbyint(note_on_time[m.note]);
      double val = (double)(step - off);
      i64 lo = std::max<i64>(0, off);          // numpy slice clipping
      i64 hi = std::min<i64>(step, (i64)W);
      for (i64 t = lo; t < hi; t++) durations[(size_t)m.note * W + t] = val;
    } else if (m.type == META_TEMPO) {
      tempo = tempo_param;  // applied AFTER the message is yielded
    }
  }
  std::fesetround(prev_round);
  return 0;
}
