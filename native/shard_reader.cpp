// Native shard reader: multithreaded tar streaming into a bounded ring
// buffer, exposed through a C ABI for ctypes.
//
// Role: the TPU-native replacement for the reference's webdataset tar
// streaming + DataLoader worker processes (SURVEY.md §2.9 "webdataset tar
// I/O"). Reader threads parse ustar archives and pair the `<key>.spec.npy` /
// `<key>.video.jpg` members of each sample; paired samples are handed to
// Python through a mutex-guarded ring buffer, so tar IO and file parsing
// overlap with host preprocessing and device compute. Decode (JPEG / npy)
// stays in the Python layer, which already backs onto native code.
//
// Build: g++ -O2 -shared -fPIC -pthread shard_reader.cpp -o libshardreader.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <memory>
#include <mutex>
#include <stdexcept>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Sample {
  std::string key;
  std::vector<uint8_t> spec;   // raw .npy bytes
  std::vector<uint8_t> video;  // raw .jpg bytes
};

struct TarEntry {
  std::string name;
  std::vector<uint8_t> data;
};

// Largest plausible tar member (a corrupt octal size field can claim up to
// 8 GB; real spec/video members are a few MB) — beyond this the shard is
// treated as corrupt instead of letting data.resize() throw bad_alloc.
constexpr uint64_t kMaxMemberSize = uint64_t(1) << 30;  // 1 GiB

// Minimal ustar streaming parser. Returns false at end of archive; throws
// std::runtime_error on a corrupt header (caught by the worker wrapper and
// surfaced to Python as a catchable error, never std::terminate).
bool read_tar_entry(std::ifstream& f, TarEntry* out) {
  char header[512];
  while (true) {
    if (!f.read(header, 512)) return false;
    bool all_zero = true;
    for (int i = 0; i < 512; ++i)
      if (header[i] != 0) { all_zero = false; break; }
    if (all_zero) return false;  // end-of-archive marker

    char size_field[13];
    std::memcpy(size_field, header + 124, 12);
    size_field[12] = '\0';
    uint64_t size = std::strtoull(size_field, nullptr, 8);
    if (size > kMaxMemberSize)
      throw std::runtime_error("corrupt tar header: member size " +
                               std::to_string(size));
    char typeflag = header[156];

    std::string name(header, strnlen(header, 100));
    // ustar prefix field
    if (std::strncmp(header + 257, "ustar", 5) == 0 && header[345] != '\0') {
      std::string prefix(header + 345, strnlen(header + 345, 155));
      name = prefix + "/" + name;
    }

    uint64_t padded = (size + 511) & ~uint64_t(511);
    if (typeflag == '0' || typeflag == '\0') {
      out->name = std::move(name);
      out->data.resize(size);
      if (!f.read(reinterpret_cast<char*>(out->data.data()), size))
        return false;
      f.ignore(padded - size);
      return true;
    }
    f.ignore(padded);  // skip non-regular entries
  }
}

bool ends_with(const std::string& s, const char* suffix) {
  size_t n = std::strlen(suffix);
  return s.size() >= n && s.compare(s.size() - n, n, suffix) == 0;
}

struct Reader {
  std::vector<std::string> shards;
  size_t ring_capacity;
  std::deque<std::unique_ptr<Sample>> ring;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::atomic<size_t> next_shard{0};
  std::atomic<bool> stopping{false};
  std::atomic<bool> failed{false};
  std::string error_msg;  // guarded by mu
  std::atomic<int> live_workers{0};
  std::vector<std::thread> threads;

  // Exception-safe wrapper: a corrupt shard must surface as a Python-level
  // error, not an exception escaping a std::thread (= std::terminate).
  void worker() {
    try {
      worker_impl();
    } catch (const std::exception& e) {
      fail(e.what());
    } catch (...) {
      fail("unknown error in shard reader worker");
    }
    // decrement under the mutex: pop()'s predicate check and its wait are
    // atomic w.r.t. mu, so modifying state under mu before notify can
    // never produce a lost wakeup
    {
      std::lock_guard<std::mutex> lk(mu);
      live_workers.fetch_sub(1);
    }
    cv_pop.notify_all();
  }

  void fail(const char* what) {
    {
      std::lock_guard<std::mutex> lk(mu);
      if (error_msg.empty()) error_msg = what;
      failed.store(true);
      stopping.store(true);
    }
    cv_push.notify_all();
    cv_pop.notify_all();
  }

  void worker_impl() {
    while (!stopping.load()) {
      size_t idx = next_shard.fetch_add(1);
      if (idx >= shards.size()) break;
      std::ifstream f(shards[idx], std::ios::binary);
      if (!f) continue;
      std::unordered_map<std::string, std::unique_ptr<Sample>> pending;
      TarEntry e;
      while (!stopping.load() && read_tar_entry(f, &e)) {
        std::string key;
        bool is_spec = false;
        if (ends_with(e.name, ".spec.npy")) {
          key = e.name.substr(0, e.name.size() - 9);
          is_spec = true;
        } else if (ends_with(e.name, ".video.jpg")) {
          key = e.name.substr(0, e.name.size() - 10);
        } else {
          continue;
        }
        auto& s = pending[key];
        if (!s) { s = std::make_unique<Sample>(); s->key = key; }
        (is_spec ? s->spec : s->video) = std::move(e.data);
        if (!s->spec.empty() && !s->video.empty()) {
          std::unique_ptr<Sample> ready = std::move(s);
          pending.erase(key);
          std::unique_lock<std::mutex> lk(mu);
          cv_push.wait(lk, [&] {
            return ring.size() < ring_capacity || stopping.load();
          });
          if (stopping.load()) return;
          ring.push_back(std::move(ready));
          cv_pop.notify_one();
        }
      }
    }
  }

  // Blocks until a sample is available or the stream is exhausted.
  std::unique_ptr<Sample> pop() {
    std::unique_lock<std::mutex> lk(mu);
    cv_pop.wait(lk, [&] {
      return !ring.empty() || live_workers.load() == 0 || stopping.load();
    });
    if (ring.empty()) return nullptr;
    auto s = std::move(ring.front());
    ring.pop_front();
    cv_push.notify_one();
    return s;
  }
};

}  // namespace

extern "C" {

void* shard_reader_open(const char** paths, int n_paths, int n_threads,
                        int ring_capacity) {
  auto* r = new Reader();
  for (int i = 0; i < n_paths; ++i) r->shards.emplace_back(paths[i]);
  r->ring_capacity = ring_capacity > 0 ? ring_capacity : 64;
  int nt = n_threads > 0 ? n_threads : 2;
  r->live_workers.store(nt);
  for (int i = 0; i < nt; ++i)
    r->threads.emplace_back([r] { r->worker(); });
  return r;
}

// Returns 1 and fills the out params on success; 0 at end of stream.
// The returned sample must be released with shard_reader_free_sample.
int shard_reader_next(void* handle, void** sample_out, const char** key,
                      const uint8_t** spec, uint64_t* spec_len,
                      const uint8_t** video, uint64_t* video_len) {
  auto* r = static_cast<Reader*>(handle);
  auto s = r->pop();
  if (!s) return 0;
  *key = s->key.c_str();
  *spec = s->spec.data();
  *spec_len = s->spec.size();
  *video = s->video.data();
  *video_len = s->video.size();
  *sample_out = s.release();
  return 1;
}

void shard_reader_free_sample(void* sample) {
  delete static_cast<Sample*>(sample);
}

// Returns 1 and points *msg at the error string if a worker failed (corrupt
// shard, etc.); the message stays valid until shard_reader_close.
int shard_reader_failed(void* handle, const char** msg) {
  auto* r = static_cast<Reader*>(handle);
  std::lock_guard<std::mutex> lk(r->mu);
  if (!r->failed.load()) return 0;
  *msg = r->error_msg.c_str();
  return 1;
}

void shard_reader_close(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  {
    // set under the mutex so a worker between its predicate check and its
    // wait cannot miss the notify (lost wakeup -> join() deadlock)
    std::lock_guard<std::mutex> lk(r->mu);
    r->stopping.store(true);
  }
  r->cv_push.notify_all();
  r->cv_pop.notify_all();
  for (auto& t : r->threads) t.join();
  delete r;
}

}  // extern "C"
