// asr_shap native host runtime: batch WER scoring and attribution persistence.
//
// The TPU owns all model/explainer compute (JAX/XLA/Pallas); what remains on
// the host in a full-test-set sweep is (a) word-level Levenshtein over many
// transcript pairs (nraw_vs_wer.py:82 capability) and (b) writing the large
// [N_audio x T_frames] attribution matrices (~110 MB/sample at 6 s,
// SURVEY.md section 3.1) to the data/ npy store. Both run here without the
// GIL so they overlap with device compute; metrics/wer.py and core/store.py
// fall back to pure Python when the library isn't built.
//
// Build: make -C native    (produces libasr_shap_native.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// Word-level Levenshtein with operation counts.
// ref/hyp are token-id sequences (any stable word->id mapping).
// out4 = {substitutions, deletions, insertions, hits}.
void wer_counts(const int32_t* ref, int32_t nref, const int32_t* hyp,
                int32_t nhyp, int32_t* out4) {
  struct Cell {
    int32_t cost, s, d, i, h;
  };
  std::vector<Cell> prev(nhyp + 1), cur(nhyp + 1);
  for (int32_t j = 0; j <= nhyp; ++j) prev[j] = {j, 0, 0, j, 0};
  for (int32_t r = 1; r <= nref; ++r) {
    cur[0] = {r, 0, r, 0, 0};
    const int32_t rt = ref[r - 1];
    for (int32_t j = 1; j <= nhyp; ++j) {
      if (rt == hyp[j - 1]) {
        const Cell& p = prev[j - 1];
        cur[j] = {p.cost, p.s, p.d, p.i, p.h + 1};
      } else {
        const Cell& sub = prev[j - 1];
        const Cell& del = prev[j];
        const Cell& ins = cur[j - 1];
        int32_t best = sub.cost < del.cost ? sub.cost : del.cost;
        if (ins.cost < best) best = ins.cost;
        if (sub.cost == best)
          cur[j] = {sub.cost + 1, sub.s + 1, sub.d, sub.i, sub.h};
        else if (del.cost == best)
          cur[j] = {del.cost + 1, del.s, del.d + 1, del.i, del.h};
        else
          cur[j] = {ins.cost + 1, ins.s, ins.d, ins.i + 1, ins.h};
      }
    }
    std::swap(prev, cur);
  }
  out4[0] = prev[nhyp].s;
  out4[1] = prev[nhyp].d;
  out4[2] = prev[nhyp].i;
  out4[3] = prev[nhyp].h;
}

// Batch variant over flattened, length-delimited sequences.
// refs/hyps: concatenated token ids; ref_lens/hyp_lens: per-pair lengths.
// out: [n_pairs, 4] counts.
void batch_wer_counts(const int32_t* refs, const int32_t* ref_lens,
                      const int32_t* hyps, const int32_t* hyp_lens,
                      int32_t n_pairs, int32_t* out) {
  int64_t ro = 0, ho = 0;
  for (int32_t i = 0; i < n_pairs; ++i) {
    wer_counts(refs + ro, ref_lens[i], hyps + ho, hyp_lens[i], out + 4 * i);
    ro += ref_lens[i];
    ho += hyp_lens[i];
  }
}

// Write a float32 C-order matrix as .npy (format 1.0). Returns 0 on success.
// Atomic: writes to "<path>.tmp" and renames on success, so a crashed or
// failed write never leaves a truncated file that resume logic would treat
// as complete.
int32_t write_npy_f32(const char* path, const float* data, int64_t rows,
                      int64_t cols) {
  std::string tmp = std::string(path) + ".tmp";
  FILE* f = std::fopen(tmp.c_str(), "wb");
  if (!f) return -1;
  std::string shape = cols >= 0
      ? "(" + std::to_string(rows) + ", " + std::to_string(cols) + ", )"
      : "(" + std::to_string(rows) + ",)";
  std::string header = "{'descr': '<f4', 'fortran_order': False, 'shape': " +
                       shape + ", }";
  // pad so magic(6)+ver(2)+hlen(2)+header is a multiple of 64, '\n'-terminated
  size_t base = 6 + 2 + 2;
  size_t total = base + header.size() + 1;
  size_t pad = (64 - (total % 64)) % 64;
  header.append(pad, ' ');
  header.push_back('\n');
  const unsigned char magic[8] = {0x93, 'N', 'U', 'M', 'P', 'Y', 1, 0};
  uint16_t hlen = static_cast<uint16_t>(header.size());
  int ok = std::fwrite(magic, 1, 8, f) == 8 &&
           std::fwrite(&hlen, 2, 1, f) == 1 &&
           std::fwrite(header.data(), 1, header.size(), f) == header.size();
  int64_t n = rows * (cols >= 0 ? cols : 1);
  ok = ok && std::fwrite(data, sizeof(float), n, f) == static_cast<size_t>(n);
  ok = (std::fclose(f) == 0) && ok;
  if (!ok) {
    std::remove(tmp.c_str());
    return -2;
  }
  if (std::rename(tmp.c_str(), path) != 0) {
    std::remove(tmp.c_str());
    return -3;
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Async npy write executor: a worker pool draining a job queue, so the
// ~110 MB-per-sample attribution writes (SURVEY.md section 3.1) overlap the
// next group's device compute instead of serializing behind it. Jobs own a
// copy of the data (a ~30 ms memcpy versus a ~500 ms disk write), so the
// caller's buffer is free immediately.
// ---------------------------------------------------------------------------

namespace {

struct WriteJob {
  std::string path;
  std::vector<float> data;
  int64_t rows, cols;
};

struct WriterPool {
  std::vector<std::thread> workers;
  std::queue<WriteJob> jobs;
  std::mutex mu;
  std::condition_variable cv;       // workers wait for jobs
  std::condition_variable idle_cv;  // flush/backpressure wait for capacity
  int64_t in_flight = 0;            // queued + being written
  int64_t max_pending;              // backpressure bound on queued copies
  std::atomic<int64_t> errors{0};
  bool stopping = false;

  explicit WriterPool(int n_threads, int64_t max_pending_jobs)
      : max_pending(max_pending_jobs < 1 ? 1 : max_pending_jobs) {
    for (int i = 0; i < n_threads; ++i)
      workers.emplace_back([this] { run(); });
  }

  void run() {
    for (;;) {
      WriteJob job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [this] { return stopping || !jobs.empty(); });
        if (jobs.empty()) return;  // stopping and drained
        job = std::move(jobs.front());
        jobs.pop();
      }
      if (write_npy_f32(job.path.c_str(), job.data.data(), job.rows,
                        job.cols) != 0)
        errors.fetch_add(1);
      {
        std::lock_guard<std::mutex> lk(mu);
        --in_flight;
        idle_cv.notify_all();  // wake flush and backpressured submitters
      }
    }
  }

  // Blocks while max_pending jobs are outstanding: bounds host memory to
  // max_pending copied buffers (~110 MB each at reference scale) instead of
  // letting a fast producer queue the whole sweep.
  void submit(const char* path, const float* data, int64_t rows,
              int64_t cols) {
    int64_t n = rows * (cols >= 0 ? cols : 1);
    WriteJob job{path, std::vector<float>(data, data + n), rows, cols};
    {
      std::unique_lock<std::mutex> lk(mu);
      idle_cv.wait(lk, [this] { return in_flight < max_pending; });
      jobs.push(std::move(job));
      ++in_flight;
    }
    cv.notify_one();
  }

  int64_t flush() {
    std::unique_lock<std::mutex> lk(mu);
    idle_cv.wait(lk, [this] { return in_flight == 0; });
    return errors.exchange(0);
  }

  ~WriterPool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stopping = true;
    }
    cv.notify_all();
    for (auto& t : workers) t.join();
  }
};

}  // namespace

extern "C" {

void* npy_writer_create(int32_t n_threads, int64_t max_pending) {
  if (n_threads < 1) n_threads = 1;
  return new WriterPool(n_threads, max_pending);
}

void npy_writer_submit(void* pool, const char* path, const float* data,
                       int64_t rows, int64_t cols) {
  static_cast<WriterPool*>(pool)->submit(path, data, rows, cols);
}

// Blocks until every submitted write has hit the filesystem; returns the
// number of failed writes since the last flush (and resets the counter).
int64_t npy_writer_flush(void* pool) {
  return static_cast<WriterPool*>(pool)->flush();
}

void npy_writer_destroy(void* pool) { delete static_cast<WriterPool*>(pool); }

}  // extern "C"
