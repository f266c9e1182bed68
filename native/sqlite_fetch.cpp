// Native SQLite → numpy fetch for the input pipeline hot path.
//
// The Python route (cursor.fetchall() + np.asarray) boxes every cell into
// a PyFloat inside a tuple and then unboxes it again — measured at ~55%
// of loader host time at production batch sizes.  This steps the query
// with the SQLite C API and writes straight into a caller-provided
// float64 buffer: no Python objects, no GIL (ctypes releases it for the
// duration of the call, so thread-pool loaders scale too).
//
// The system image ships libsqlite3.so.0 but no sqlite3.h; the needed
// slice of the (stable) C ABI is declared here directly.

extern "C" {
typedef struct sqlite3 sqlite3;
typedef struct sqlite3_stmt sqlite3_stmt;
int sqlite3_open_v2(const char*, sqlite3**, int, const char*);
int sqlite3_close(sqlite3*);
int sqlite3_prepare_v2(sqlite3*, const char*, int, sqlite3_stmt**,
                       const char**);
int sqlite3_step(sqlite3_stmt*);
int sqlite3_finalize(sqlite3_stmt*);
int sqlite3_column_count(sqlite3_stmt*);
int sqlite3_column_type(sqlite3_stmt*, int);
double sqlite3_column_double(sqlite3_stmt*, int);
}

static const int kSqliteOk = 0;
static const int kSqliteRow = 100;
static const int kSqliteDone = 101;
static const int kSqliteOpenReadonly = 1;
static const int kSqliteInteger = 1;
static const int kSqliteFloat = 2;

extern "C" {

// Open a read-only connection. Returns nullptr on failure.
void* gn_sqlite_open(const char* path) {
  sqlite3* db = nullptr;
  if (sqlite3_open_v2(path, &db, kSqliteOpenReadonly, nullptr) !=
      kSqliteOk) {
    if (db) sqlite3_close(db);
    return nullptr;
  }
  return db;
}

void gn_sqlite_close(void* db) {
  if (db) sqlite3_close(static_cast<sqlite3*>(db));
}

// Run `sql`, writing numeric cells row-major into out[cap_rows * ncols].
// Returns:
//   >= 0          number of rows written
//   -1            prepare error / column-count mismatch
//   -2            non-numeric cell (NULL/TEXT/BLOB) — caller falls back
//                 to the Python route, matching its TypeError fallback
//   -(n + 3)      buffer too small; n = total rows the query yields
long long gn_sqlite_fetch_f64(void* dbv, const char* sql, double* out,
                              long long cap_rows, int ncols) {
  sqlite3* db = static_cast<sqlite3*>(dbv);
  sqlite3_stmt* stmt = nullptr;
  if (sqlite3_prepare_v2(db, sql, -1, &stmt, nullptr) != kSqliteOk) {
    if (stmt) sqlite3_finalize(stmt);
    return -1;
  }
  if (sqlite3_column_count(stmt) != ncols) {
    sqlite3_finalize(stmt);
    return -1;
  }
  long long rows = 0;
  int rc;
  while ((rc = sqlite3_step(stmt)) == kSqliteRow) {
    if (rows < cap_rows) {
      double* dst = out + rows * ncols;
      for (int c = 0; c < ncols; ++c) {
        const int t = sqlite3_column_type(stmt, c);
        if (t != kSqliteInteger && t != kSqliteFloat) {
          sqlite3_finalize(stmt);
          return -2;
        }
        dst[c] = sqlite3_column_double(stmt, c);
      }
    }
    ++rows;
  }
  sqlite3_finalize(stmt);
  if (rc != kSqliteDone) return -1;
  if (rows > cap_rows) return -(rows + 3);
  return rows;
}

}  // extern "C"
